"""Custom compute ops: scan-based LSTM, torch-compatible resizing, Pallas kernels."""

from sos_tpu.ops.lstm import lstm_scan, BiLSTM  # noqa: F401
from sos_tpu.ops.resize import nearest_resize_1d  # noqa: F401
