#!/bin/bash
# TPU equivalent of the reference cluster recipe
# (/root/reference/example_scripts/czechtriever.sh): throughput check,
# then one of the training variants, against a v5e/v5p slice. SGE+CUDA
# plumbing (get_free_gpus, CUDA_VISIBLE_DEVICES, conda) is replaced by
# SLURM + jax.distributed auto-init (czechtriever_tpu/parallel/mesh.py
# picks up SLURM_* env; TPU device discovery needs no visibility vars).
#
#SBATCH --job-name=czechtriever
#SBATCH --time=240:00:00
#SBATCH --nodes=1                 # one host per v5e-8; scale nodes with the slice
#SBATCH --signal=USR1@120         # preemption requeue (utils/slurm.py)
#SBATCH --output=logs/%x-%j.out

set -euo pipefail

HOMEDIR=${HOMEDIR:-$PWD}
OUT_DIR=${OUT_DIR:-czechtriever-czert-tpu}
DATA=${DATA:-$HOMEDIR/data}

# HF caches for the Czert snapshot (offline, parity with the reference)
export HF_HOME=$HOMEDIR/hf
export HF_DATASETS_OFFLINE=1 TRANSFORMERS_OFFLINE=1

# ---- throughput check before training (reference line 77) -----------------
python -m czechtriever_tpu.cli.eval_throughput --search \
    > contriever_throughput_eval.txt

# ---- DEFAULT: MoCo pre-training on the uint16 token stream -----------------
# (reference "DEFAULT" torchrun line; per_gpu_batch_size becomes
# per_device_batch_size, DDP becomes the mesh data axis, NCCL gathers
# become implicit GSPMD all-gathers)
python -m czechtriever_tpu.cli.train \
    --retriever_model_id czert --pooling average \
    --train_data "$DATA/tokens.bin" --valid_data "$DATA/valid-portion.jsonl" \
    --ratio_min 0.1 --ratio_max 0.5 --chunk_length 256 \
    --momentum 0.9995 --queue_size 131072 --temperature 0.05 \
    --warmup_steps 20000 --total_steps 500000 --lr 0.000005 \
    --scheduler linear --optim adamw \
    --per_device_batch_size 256 --target_batch_size 2048 \
    --prob_augmentation 0.1 --augmentation delete \
    --eval_datasets fit-eval --eval_datasets_dir "BEIR/datasets" \
    --save_freq 2000 --seed 69 --pack_rows 256 \
    --output_dir "logs/$OUT_DIR" --save_dir "/mnt/scratch/$USER/$OUT_DIR"
# resume is automatic: an existing save_dir/checkpoint/latest is picked up
# --pack_rows 256: length-packed hot loop (2.3x the reference-plan
# rate on one v5e; docs/PERF.md round-9). Drop it (or --parity) for
# bit-reproducible reference numerics. Add --pack_rebalance for
# another +3.2% (2.4x e2e measured) — it reassigns each step's pairs
# across microbatches (within-step MoCo queue-order deviation,
# epsilon at queue 131k; docs/PERF.md round-9 continuation).

# ---- variants (mirror the commented torchrun lines in the reference) -------
# wiki-jsonl source (LazyDataset path):
#   ... --train_data "$DATA/train.kb.jsonl" --offsets_file "$DATA/offsets.pkl"
# multi-corpus mixture (reference load_and_tokenize_datasets /
# data_preprocessed paths; prob ~ len^coeff):
#   ... --train_data "$DATA/wiki.jsonl" "$DATA/web.jsonl" "$DATA/shards_dir" \
#       --sampling_coefficient 0.5 --loading_mode split
# warm start / continuation from an earlier run:
#   ... --model_path "/mnt/scratch/$USER/old-run" [--continue_training]
# strict reference numerics (f32 queue, per-microbatch EMA):
#   ... --parity
# distillation (teacher time-sliced on the mesh, distill.py topology):
#   python -m czechtriever_tpu.cli.distill ... --target_batch_size 1024 \
#       --teacher_model_id models/teacher --distill_weight 0.5 --eval_freq 100
# in-batch objective:
#   python -m czechtriever_tpu.cli.train ... --contrastive_mode inbatch \
#       --target_batch_size 1024

# ---- offline retrieval after training (generate -> retrieve -> score) ------
# python -m czechtriever_tpu.cli.generate_embeddings \
#     --model_name_or_path "logs/$OUT_DIR/checkpoint/latest" \
#     --passages "$DATA/passages.jsonl" --shard_id 0 --num_shards 1 \
#     --output_dir embeddings/
# python -m czechtriever_tpu.cli.retrieve \
#     --model_name_or_path "logs/$OUT_DIR/checkpoint/latest" \
#     --passages "$DATA/passages.jsonl" --passages_embeddings "embeddings/*" \
#     --data "$DATA/questions.jsonl" --output_dir retrieved/
# python -m czechtriever_tpu.cli.evaluate_retrieved --data retrieved/questions.jsonl
