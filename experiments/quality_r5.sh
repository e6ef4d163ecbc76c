#!/bin/bash
# Round-5 AVSPEECH-scale experiment (VERDICT r4 #5, #3, #2b): a
# 2,200-clip corpus — the reference's training scale (~2,214 AVSPEECH
# train files, reference README.md:24-30, m1 dataset.py:43) — driven
# entirely through the public CLIs:
#
#   1. train_detector / train_denoiser / train_joint at 2,200 clips
#      (records steps/sec from metrics.jsonl: the prefetch/LRU host
#      path under REAL training, not the standalone certification);
#   2. per-SNR detection quality (predicted intervals) on the held-out
#      test split;
#   3. per-SNR denoise quality + noisy baseline (eval_synthetic);
#   4. the whole-bf16-profile certification on TRAINED checkpoints
#      (f32 vs bf16 profile deltas; bf16 = bf16 trunks + bf16 LSTM
#      input projection as of r5);
#   5. the streaming chunk-geometry sweep (2s/0.5s vs 4s/1s vs 6s/1s)
#      for the streamed-vs-whole PESQ gap.
#
# Results recorded in docs/EXPERIMENTS.md.
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash experiments/quality_r5.sh /tmp/e2e_r5
set -e
OUT=${1:-/tmp/e2e_r5}
cd "$(dirname "$0")/.."

if [ ! -f "$OUT/train.json" ]; then
  python experiments/make_corpus.py --out "$OUT" \
      --train 2200 --test 40 --clip_seconds 8.0 --noise_tracks 12 --seed 1
fi

COMMON="--output_root $OUT/model_output --name r5"
TRAIN="--dataset_json $OUT/train.json --test_dataset_json $OUT/test.json \
       --noise_root $OUT/noise $COMMON"

python -m sos_tpu.cli.train_detector $TRAIN --epochs 3 2>&1 | tail -3
python -m sos_tpu.cli.train_denoiser $TRAIN --epochs 3 --batch_size 10 \
    2>&1 | tail -3
python -m sos_tpu.cli.train_joint $TRAIN --epochs 1 --batch_size 10 \
    --name r5j 2>&1 | tail -3

# training throughput at scale: median steps/sec per stage
python - "$OUT" << 'EOF'
import glob, json, sys
import numpy as np
out = sys.argv[1]
print("\n=== train throughput at 2,200 clips (median steps/sec) ===")
for log in sorted(glob.glob(f"{out}/model_output/*/log/metrics.jsonl")):
    rates = [json.loads(l).get("steps_per_sec") for l in open(log)
             if '"kind": "train"' in l]
    rates = [r for r in rates if r]
    if rates:
        name = log.split("/")[-3]
        print(f"{name}: {np.median(rates):.2f} steps/s "
              f"(n={len(rates)}, p10={np.percentile(rates,10):.2f})")
EOF

# per-SNR detection quality on the held-out split (predicted intervals)
for IDX in 0 3 6; do
  python -m sos_tpu.cli.predict_detector --dataset_json "$OUT/test.json" \
      --noise_root "$OUT/noise" $COMMON --ckpt latest --snr_idx $IDX \
      --outputs "$OUT/pred_out" 2>&1 | tail -1
done

# per-SNR denoise quality (ground-truth intervals) + noisy baseline
python -m sos_tpu.cli.eval_synthetic --dataset_json "$OUT/test.json" \
    --noise_root "$OUT/noise" $COMMON --ckpt latest \
    --snr_idx 0 3 6 --noisy_baseline --out "$OUT/quality.json"

# whole-bf16-profile certification on the trained checkpoints:
# f32 vs bf16 at the hardest and easiest SNRs (target |delta| <= 0.01)
for PROF in f32 bf16; do
  python -m sos_tpu.cli.eval_synthetic --dataset_json "$OUT/test.json" \
      --noise_root "$OUT/noise" $COMMON --ckpt latest --profile $PROF \
      --snr_idx 0 6 --out "$OUT/quality_$PROF.json"
done
python - "$OUT" << 'EOF'
import json, sys
out = sys.argv[1]
f32 = json.load(open(f"{out}/quality_f32.json"))
b16 = json.load(open(f"{out}/quality_bf16.json"))
print("\n=== bf16 profile deltas vs f32 (trained ckpts) ===")
deltas = {}
for (snr, a), (_, b) in zip(sorted(f32.items()), sorted(b16.items())):
    for k in a:
        if k.startswith("avg_"):
            deltas[f"{snr}:{k}"] = b[k] - a[k]
            print(f"snr {snr} {k:<18} {b[k]-a[k]:+.5f}")
json.dump(deltas, open(f"{out}/bf16_profile_deltas.json", "w"), indent=1)
EOF

# streaming chunk-geometry sweep (streamed-vs-whole PESQ gap)
for GEO in "2.0 0.5" "4.0 1.0" "6.0 1.0"; do
  set -- $GEO
  python experiments/streaming_quality.py --corpus "$OUT" \
      --detector_root "$OUT/model_output" --denoiser_root "$OUT/model_output" \
      --name r5 --snr 0 --chunk_seconds "$1" --overlap_seconds "$2" \
      --out "experiments/streaming_quality_r5_c${1}_o${2}.json" 2>&1 | tail -4
done
