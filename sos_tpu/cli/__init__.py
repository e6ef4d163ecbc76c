"""Command-line entry points mirroring the reference's train/predict scripts.

    python -m sos_tpu.cli.preprocess        <- preprocessing/preprocessor_audioonly.py
    python -m sos_tpu.cli.train_detector    <- model_1 train.py
    python -m sos_tpu.cli.predict_detector  <- model_1 predict.py
    python -m sos_tpu.cli.bridge            <- model_1 create_data_from_pred.py
    python -m sos_tpu.cli.train_denoiser    <- model_2 train.py
    python -m sos_tpu.cli.predict_denoiser  <- model_2 predict.py
    python -m sos_tpu.cli.report            <- model_2 draw_agg_stats.py

TPU-native additions with no reference equivalent:

    python -m sos_tpu.cli.train_joint       both stages, one SPMD step
    python -m sos_tpu.cli.denoise           one-shot wav -> wav (fused)
    python -m sos_tpu.cli.eval_synthetic    batched per-SNR quality eval
    python -m sos_tpu.cli.import_checkpoint .pth -> orbax experiment
    python -m sos_tpu.cli.export_serving    AOT StableHLO serving artifact
    python -m sos_tpu.cli.serve             long-lived denoising server
"""
