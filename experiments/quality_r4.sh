#!/bin/bash
# Round-4 scaled quality experiment (VERDICT r3 #10): 200-clip corpus,
# 6 noise families, detector trained to a meaningful F1/AUC regime,
# per-SNR detection stats + denoise deltas, bundled HTML report.
# Results recorded in docs/EXPERIMENTS.md.
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash experiments/quality_r4.sh /tmp/e2e_r4
set -e
OUT=${1:-/tmp/e2e_r4}
cd "$(dirname "$0")/.."

python experiments/make_corpus.py --out "$OUT" \
    --train 200 --test 30 --clip_seconds 8.0 --noise_tracks 12 --seed 1

COMMON="--output_root $OUT/model_output --name r4"
TRAIN="--dataset_json $OUT/train.json --test_dataset_json $OUT/test.json \
       --noise_root $OUT/noise $COMMON"

python -m sos_tpu.cli.train_detector $TRAIN --epochs 10 \
    2>&1 | tail -3
python -m sos_tpu.cli.train_denoiser $TRAIN --epochs 10 --batch_size 10 \
    2>&1 | tail -3

# per-SNR detection quality on the held-out test split (predicted
# intervals; eval_results carries tp/fp/F1/AUC/MCC = show_metrics parity)
for IDX in 0 3 6; do
  python -m sos_tpu.cli.predict_detector --dataset_json "$OUT/test.json" \
      --noise_root "$OUT/noise" $COMMON --ckpt latest --snr_idx $IDX \
      --outputs "$OUT/pred_out" 2>&1 | tail -1
done

# per-SNR denoise quality (ground-truth intervals) + noisy baseline
python -m sos_tpu.cli.eval_synthetic --dataset_json "$OUT/test.json" \
    --noise_root "$OUT/noise" $COMMON --ckpt latest \
    --snr_idx 0 3 6 --noisy_baseline --out "$OUT/quality.json"

python - "$OUT" << 'EOF'
import glob, json, sys
out = sys.argv[1]
print("\n=== detection per SNR (test split, predicted intervals) ===")
for path in sorted(glob.glob(f"{out}/pred_out/eval_results_snr*.json")):
    with open(path) as fp:
        stats = json.load(fp)["prediction_statistics"]["all"]
    keep = {k: round(v, 4) if isinstance(v, float) else v
            for k, v in stats.items()
            if k in ("accuracy", "precision", "true_pos_rate(recall)",
                     "f1", "roc_auc", "mcc")}
    print(path.split("eval_results_")[-1], keep)
EOF

python -m sos_tpu.cli.report --results_dir "$OUT/pred_out" \
    --html "$OUT/report.html" || true
echo "experiment artifacts under $OUT"
