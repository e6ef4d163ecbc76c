"""PyTorch oracle networks for numerical parity tests.

These rebuild the reference architectures (m1 networks.py:80-155,
m2 networks.py:28-217) as torch modules whose state_dict keys match the
reference checkpoints, so the same importer path
(`sos_tpu.models.torch_import`) is exercised end-to-end: random torch
weights -> flax variables -> output comparison.

Built programmatically from (kernel, dilation) specs; sizes are
parameterizable so parity tests stay fast on the 1-core CI host.
"""

from typing import List, Sequence, Tuple

import torch
import torch.nn as tnn
import torch.nn.functional as tF


class _ConvBNBlock(tnn.Module):
    """Conv2d + BN + ReLU with same-style dilated padding; key layout `block.{0,1,2}`."""

    def __init__(self, cin, cout, k: Tuple[int, int], d: Tuple[int, int]):
        super().__init__()
        pad = ((k[0] - 1) // 2 * d[0], (k[1] - 1) // 2 * d[1])
        self.block = tnn.Sequential(
            tnn.Conv2d(cin, cout, k, 1, pad, d, bias=False),
            tnn.BatchNorm2d(cout),
            tnn.ReLU(),
        )

    def forward(self, x):
        return self.block(x)


class _DownBlock(tnn.Module):
    """ReflectionPad + Conv2d + (BN + PReLU); key layout `block.{0..3}`."""

    def __init__(self, cin, cout, k, s, d=1, bare=False):
        super().__init__()
        pad = (k - 1) // 2 * d
        mods: List[tnn.Module] = [
            tnn.ReflectionPad2d(pad),
            tnn.Conv2d(cin, cout, k, s, 0, d, bias=bare),
        ]
        if not bare:
            mods += [tnn.BatchNorm2d(cout), tnn.PReLU()]
        self.block = tnn.Sequential(*mods)

    def forward(self, x):
        return self.block(x)


class _UpBlock(tnn.Module):
    """ConvTranspose2d + BN + PReLU; key layout `block.{0,1,2}`."""

    def __init__(self, cin, cout, k, s):
        super().__init__()
        pad = (k - 1) // 2
        # output_padding=1: the reference passes `dilation` positionally
        # into ConvTranspose2d's output_padding slot (m2 networks.py:130).
        self.block = tnn.Sequential(
            tnn.ConvTranspose2d(cin, cout, k, s, pad, 1, bias=False),
            tnn.BatchNorm2d(cout),
            tnn.PReLU(),
        )

    def forward(self, x):
        return self.block(x)


def _enc_stack(specs, cin, nf, outf):
    blocks = []
    c = cin
    for k, d in specs:
        blocks.append(_ConvBNBlock(c, nf, k, d))
        c = nf
    blocks.append(_ConvBNBlock(c, outf, (1, 1), (1, 1)))
    return tnn.Sequential(*blocks)


class DetectorOracle(tnn.Module):
    def __init__(self, specs: Sequence[Tuple[Tuple[int, int], Tuple[int, int]]],
                 freq_bins=256, nf=48, outf=8, hidden=100, fc_hidden=100):
        super().__init__()
        self.encoder_audio = _enc_stack(specs, 2, nf, outf)
        self.lstm = tnn.LSTM(input_size=outf * freq_bins, hidden_size=hidden,
                             bidirectional=True)
        self.fc1 = tnn.Sequential(
            tnn.Linear(2 * hidden, fc_hidden), tnn.ReLU(True),
            tnn.Linear(fc_hidden, 1))

    def forward(self, spec, v_num_frames=60):
        h = self.encoder_audio(spec)                        # (B, C, F, T)
        h = h.reshape(h.size(0), -1, h.size(3))             # (B, C*F, T)
        h = tF.interpolate(h, size=v_num_frames)            # nearest
        h = h.permute(2, 0, 1)                              # (T, B, C*F)
        h, _ = self.lstm(h)
        h = h.permute(1, 0, 2)
        return self.fc1(h).squeeze(2)


class InpaintOracle(tnn.Module):
    def __init__(self, ch=(64, 128, 256)):
        super().__init__()
        c1, c2, c3 = ch
        self.down1 = tnn.Sequential(_DownBlock(2, c1, 5, 1))
        self.down2 = tnn.Sequential(_DownBlock(c1, c2, 5, 2), _DownBlock(c2, c2, 5, 1))
        self.down3 = tnn.Sequential(_DownBlock(2, c1, 5, 1))
        self.down4 = tnn.Sequential(_DownBlock(c1, c2, 5, 2), _DownBlock(c2, c2, 5, 1))
        self.mid = tnn.Sequential(
            _DownBlock(c2 * 2, c3, 3, 2), _DownBlock(c3, c3, 3, 1),
            _DownBlock(c3, c3, 3, 1, d=2), _DownBlock(c3, c3, 3, 1, d=4),
            _DownBlock(c3, c3, 3, 1, d=8), _DownBlock(c3, c3, 3, 1, d=16),
            _DownBlock(c3, c3, 3, 1), _DownBlock(c3, c3, 3, 1),
            _UpBlock(c3, c2, 3, 2))
        self.up1 = tnn.Sequential(_DownBlock(c2 * 2, c2, 3, 1), _UpBlock(c2, c1, 3, 2))
        self.up2 = tnn.Sequential(_DownBlock(c1 * 2, c1, 3, 1),
                                  _DownBlock(c1, 2, 3, 1, bare=True))

    def forward(self, gated, mixed):
        d1 = self.down1(gated)
        d2 = self.down2(d1)
        d3 = self.down3(mixed)
        d4 = self.down4(d3)
        h = self.mid(torch.cat([d2, d4], dim=1))
        if h.shape != d4.shape:
            h = tF.interpolate(h, d4.size()[-2:])
        h = self.up1(torch.cat([h, d4], dim=1))
        if h.shape != d3.shape:
            h = tF.interpolate(h, d3.size()[-2:])
        return self.up2(torch.cat([h, d3], dim=1))


class ContextOracle(tnn.Module):
    def __init__(self, specs, freq_bins=256, nf=96, outf_x=8, outf_n=4,
                 hidden=200, fc_hidden=600):
        super().__init__()
        self.encoder_x = _enc_stack(specs, 2, nf, outf_x)
        self.encoder_n = _enc_stack(specs, 2, nf // 2, outf_n)
        self.lstm = tnn.LSTM(input_size=(outf_x + outf_n) * freq_bins,
                             hidden_size=hidden, bidirectional=True)
        self.fc = tnn.Sequential(
            tnn.Linear(2 * hidden, fc_hidden), tnn.ReLU(True),
            tnn.Linear(fc_hidden, fc_hidden), tnn.ReLU(True),
            tnn.Linear(fc_hidden, freq_bins * 2), tnn.Sigmoid())

    def forward(self, mixed, noise):
        fx = self.encoder_x(mixed)
        fx = fx.reshape(fx.size(0), -1, fx.size(3)).permute(2, 0, 1)
        fn = self.encoder_n(noise)
        fn = fn.reshape(fn.size(0), -1, fn.size(3)).permute(2, 0, 1)
        h, _ = self.lstm(torch.cat([fx, fn], dim=2))
        h = self.fc(h.permute(1, 0, 2))
        return h.permute(0, 2, 1).reshape(h.size(0), 2, -1, h.size(1))


class JointOracle(tnn.Module):
    def __init__(self, specs, freq_bins=256, ch=(64, 128, 256), nf=96,
                 hidden=200, fc_hidden=600):
        super().__init__()
        self.stage1 = InpaintOracle(ch)
        self.stage2 = ContextOracle(specs, freq_bins, nf, 8, 4, hidden, fc_hidden)

    def forward(self, mixed, gated_noise):
        n_pred = self.stage1(gated_noise, mixed)
        return n_pred, self.stage2(mixed, n_pred)


def randomize_bn_stats(module: tnn.Module, gen: torch.Generator) -> None:
    """Make running stats non-trivial so importer mistakes are visible."""
    for m in module.modules():
        if isinstance(m, (tnn.BatchNorm2d,)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=gen) * 0.3)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=gen) + 0.5)
