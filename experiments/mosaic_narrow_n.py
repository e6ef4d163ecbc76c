"""Measure the Mosaic int8 matmul TOPS cap as a function of the narrow dim.

Context (docs/ROADMAP.md "two-stage"): the int8 detector trunk's only
remaining tax is the XLA conv emitter's per-tap 48->128 lane padding, and
the recorded ceiling analysis said a dense-K Pallas implicit-GEMM "could
in principle win ~1.5x" based on the measured ~224 TOPS Mosaic cap at
2048^3 (all dims >=128). But an implicit-GEMM conv tile necessarily has
ONE matmul dim equal to C_out=48 (<128): either N (positions-as-M form)
or M (channels-as-M form). If the MXU's 128x128 array wastes the unused
rows/columns in that dim, the Pallas cap drops by 48/128 and the kernel
CANNOT win. This script measures exactly that: Mosaic int8 matmul TOPS
at M=4096, K=1280 (dense-K trunk geometry) for narrow N, the transposed
narrow-M form, and the same shapes through XLA's jnp.dot for reference.

Timing: the remote-TPU tunnel adds ~30 ms fixed per dispatched program
and block_until_ready is unreliable, so each measurement is ONE jitted
program doing reps x matmuls (inner fori_loop over a b-stack to defeat
CSE) with a fetched scalar checksum, and the per-call fixed cost is
subtracted via a reps=1 run of the same program shape.
"""
import os
import time

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NB = 8  # distinct B operands cycled by the inner loop


def matmul_kernel(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)


def make_pallas(m, k, n, tile_m):
    return pl.pallas_call(
        matmul_kernel,
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int32),
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
    )


def make_xla(m, k, n):
    def fn(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
    return fn


def timed(fn, a, b_stack, reps):
    @jax.jit
    def bench(a, b_stack):
        def body(i, carry):
            out = fn(a, b_stack[i % NB])
            return carry + out[::173, ::7].sum()

        return jax.lax.fori_loop(0, reps, body, jnp.int32(0))

    float(bench(a, b_stack))  # compile + warm
    t0 = time.perf_counter()
    float(bench(a, b_stack))
    return time.perf_counter() - t0


def measure(make, m, k, n, reps, rng, tile_m=None):
    a = jnp.asarray(rng.integers(-127, 128, (m, k), np.int8))
    b_stack = jnp.asarray(rng.integers(-127, 128, (NB, k, n), np.int8))
    fn = make_pallas(m, k, n, tile_m or min(m, 512)) if make == "pallas" \
        else make_xla(m, k, n)
    t_full = timed(fn, a, b_stack, reps)
    t_one = timed(fn, a, b_stack, 1)
    dt = (t_full - t_one) / (reps - 1)
    tops = 2 * m * k * n / dt / 1e12
    return dt, tops


def main():
    rng = np.random.default_rng(0)
    m, k = 4096, 1280
    reps = 512
    print(f"int8 matmul M={m} K={k}, reps={reps}, fixed-cost-subtracted")
    for impl in ("pallas", "xla"):
        for n in (48, 64, 128, 256, 512):
            dt, tops = measure(impl, m, k, n, reps, rng)
            print(f"  {impl:6s} N={n:4d}: {dt*1e6:8.1f} us  {tops:7.1f} TOPS",
                  flush=True)
    # transposed form: channels-as-M (output tile 48 sublanes wide)
    for impl in ("pallas", "xla"):
        for mm in (48, 64, 128):
            dt, tops = measure(impl, mm, k, 4096, reps, rng, tile_m=mm)
            print(f"  {impl:6s} M={mm:4d} (N=4096): {dt*1e6:8.1f} us  "
                  f"{tops:7.1f} TOPS", flush=True)


if __name__ == "__main__":
    main()
