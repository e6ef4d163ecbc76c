"""Golden-file parity: our bridge vs the reference's committed artifacts.

The reference repo ships a demo run's stage-1 output (eval_results.json)
AND the stage-bridge output produced from it (pred_data.json). Feeding
the former through our `create_data_from_prediction` must reproduce the
latter's bitstreams and statistics exactly.
"""

import json
import os

import pytest

from sos_tpu.config import ExperimentConfig
from sos_tpu.infer.evaluate import create_data_from_prediction

GOLD_DIR = ("/root/reference/model_1_silent_interval_detection/model_output/"
            "audioonly_model/outputs/sounds_of_silence")


@pytest.mark.skipif(not os.path.isdir(GOLD_DIR), reason="golden dir absent")
def test_bridge_reproduces_golden_pred_data(tmp_path):
    out_json = str(tmp_path / "pred_data.json")
    create_data_from_prediction(
        ExperimentConfig(),
        os.path.join(GOLD_DIR, "eval_results.json"),
        output_json=out_json,
        noise_snr=None,
        clean_audio=False,
        save_results=False,  # source wavs don't exist on this machine
    )
    with open(out_json) as fp:
        ours = json.load(fp)
    with open(os.path.join(GOLD_DIR, "pred_data.json")) as fp:
        golden = json.load(fp)

    assert ours["num_videos"] == golden["num_videos"]
    assert ours["data_total_frames"] == golden["data_total_frames"]
    assert ours["sigmoid_threshold"] == golden["sigmoid_threshold"]

    # per-frame statistics identical
    for key, want in golden["prediction_statistics"].items():
        got = ours["prediction_statistics"][key]
        if want is None:
            assert got is None, key
        else:
            assert got == pytest.approx(want, abs=1e-9), key

    ours_files = {f["path"]: f for f in ours["files"]}
    for gf in golden["files"]:
        of = ours_files[gf["path"]]
        assert of["bit_stream"] == gf["bit_stream"]
        assert of["ground_truth_bit_stream"] == gf["ground_truth_bit_stream"]
        assert of["predicted_bit_stream"] == gf["predicted_bit_stream"]
        assert of["recovered_prediction"] == gf["recovered_prediction"]
        assert of["num_frames"] == gf["num_frames"]
        assert of["framerate"] == gf["framerate"]
        assert of["duration"] == gf["duration"]
