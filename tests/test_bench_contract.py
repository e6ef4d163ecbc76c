"""bench.py contract guards (no device needed).

The driver consumes bench.py's single JSON line; its wedged-tunnel
fallback must stay traceable to a committed artifact (round-3 advisor
finding: a hardcoded fallback payload whose provenance can't be checked
from the repo). These tests pin that contract by static inspection —
running bench.py itself needs the real chip.
"""

import ast
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _watchdog_payload():
    """The dict printed by bench.py's liveness watchdog, with every
    literal-valued key evaluated (the f-string "error" message is
    skipped — its wording isn't part of the contract)."""
    tree = ast.parse(open(os.path.join(ROOT, "bench.py")).read())
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = {getattr(k, "value", None) for k in node.keys}
            if "last_recorded" in keys and "error" in keys:
                out = {}
                for k, v in zip(node.keys, node.values):
                    try:
                        out[k.value] = ast.literal_eval(v)
                    except ValueError:
                        out[k.value] = None  # non-literal (f-string)
                return out
    raise AssertionError("watchdog payload dict not found in bench.py")


def test_fallback_payload_matches_committed_snapshot():
    payload = _watchdog_payload()
    last = payload["last_recorded"]
    src = last["source"]
    snap_path = os.path.join(ROOT, src)
    assert os.path.isfile(snap_path), (
        f"bench.py's fallback cites {src} which is not in the repo")
    snap = json.load(open(snap_path))
    assert last["vs_baseline"] == snap["vs_baseline"]
    assert last["profiles"] == snap["profiles"], (
        "bench.py fallback numbers drifted from the committed artifact")


def test_train_bench_snapshot_is_committed_and_consistent():
    """VERDICT r4 #6: the training-throughput numbers must live in a
    committed, internally-consistent artifact (like the inference
    snapshot), not only in docs tables. Pins: (a) the snapshot exists,
    (b) its regimes are exactly the ones experiments/train_bench.py
    measures (static inspection of the regime tuple), (c) each row's
    audio_s_per_s is arithmetically consistent with its ms_per_step and
    batch at the production 2 s denoiser window, (d) the median lies
    inside its own spread."""
    snap_path = os.path.join(ROOT, "experiments", "train_bench_snapshot.json")
    assert os.path.isfile(snap_path)
    snap = json.load(open(snap_path))
    assert snap["metric"] == "denoiser_train_step"
    assert snap["unit"] == "ms_per_step"

    # (b) regime names pinned to the bench script's own definition
    tree = ast.parse(
        open(os.path.join(ROOT, "experiments", "train_bench.py")).read())
    script_regimes = set()
    for node in ast.walk(tree):
        if (isinstance(node, ast.Tuple) and len(node.elts) == 4
                and isinstance(node.elts[0], ast.Constant)
                and isinstance(node.elts[0].value, str)
                and isinstance(node.elts[3], ast.Constant)
                and isinstance(node.elts[3].value, int)):
            script_regimes.add(node.elts[0].value)
    assert script_regimes, "regime tuples not found in train_bench.py"
    assert set(snap["regimes"]) == script_regimes, (
        "snapshot regimes drifted from experiments/train_bench.py")

    clip_seconds = 2.0  # DataConfig.clip_seconds, the production window
    for name, row in snap["regimes"].items():
        lo, hi = row["spread"]
        assert lo <= row["ms_per_step"] <= hi, name
        expect = 1e3 * row["batch"] * clip_seconds / row["ms_per_step"]
        assert abs(expect - row["audio_s_per_s"]) < 0.1, (
            name, expect, row["audio_s_per_s"])


def test_fallback_payload_schema_matches_healthy_line():
    """Consumers parse ONE schema: the error line carries the same
    metric/unit keys and {median, spread} profile shape as a healthy
    run (and value 0.0 so it can't be mistaken for a measurement)."""
    payload = _watchdog_payload()
    assert payload["metric"] == "two_stage_denoise_throughput"
    assert payload["value"] == 0.0 and payload["vs_baseline"] == 0.0
    for name in ("two_stage", "int8", "bf16", "f32"):
        prof = payload["last_recorded"]["profiles"][name]
        assert set(prof) == {"median", "spread"}
        assert prof["median"] > 0
