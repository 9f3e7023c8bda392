#!/usr/bin/env bash
# StreamBench v0.3 end-to-end driver (TPU rebuild of the reference's
# inference_streamchat_v0.3.sh): stage 1 streaming pipeline, stage 2 LLaMA-3
# judge, stage 3 score aggregation.
#
# Canonical v0.3 hyperparameters reproduced from the reference driver
# (inference_streamchat_v0.3.sh:6-27). One TPU process replaces the 2-GPU
# pipeline stage and the per-GPU judge fan-out: annotation- and judge-level
# data parallelism happen inside the runners (--num_chunks/--chunk_idx are
# still honored for multi-host sharding).
set -euo pipefail

LONGVA=${LONGVA:-}            # LongVA-7B-DPO checkpoint dir
LLAMA_3=${LLAMA_3:-}          # LLaMA-3-8B-Instruct checkpoint dir
COLBERT=${COLBERT:-}          # mxbai-colbert-large-v1 checkpoint dir
MINILM=${MINILM:-}            # all-MiniLM-L6-v2 checkpoint dir
VIDEO_DIR=${VIDEO_DIR:?set VIDEO_DIR to the StreamBench video root}
ANNOTATIONS=${ANNOTATIONS:?set ANNOTATIONS to streaming_bench_v0.3.json}
SAVE_DIR=${SAVE_DIR:-./streambench_out}

mkdir -p "${SAVE_DIR}"
OURS_EGO="${SAVE_DIR}/results_v0.3.json"

python -m streamchat_tpu.pipeline.runner \
    ${LONGVA:+--model_name "${LONGVA}"} \
    ${COLBERT:+--embedding_model "${COLBERT}"} \
    ${MINILM:+--minilm_model "${MINILM}"} \
    --video_dir "${VIDEO_DIR}" \
    --annotations "${ANNOTATIONS}" \
    --conv-mode qwen_1_5 \
    --temperature 0.2 \
    --sample_rate 0.2 \
    --chunk_size 40 \
    --num_clusters 5 \
    --interval 10 \
    --short_window 20 \
    --remember_window 5 \
    --tau 5 \
    --compress_rate 1 \
    --num_beams 1 \
    --mode on_line \
    --memory_basic_dir "${SAVE_DIR}/memories" \
    --save_file "${OURS_EGO}" \
    --memory_search_top_k 1 \
    --language en \
    --multi_modal_memory

JUDGE_DIR="${SAVE_DIR}/StreamingBench_v0.3/Ours_rate0.2_chunk40"
mkdir -p "${JUDGE_DIR}"

python -m streamchat_tpu.eval.judge \
    --predict_file "${OURS_EGO}" \
    --output_dir "${JUDGE_DIR}" \
    --output_name streamingbench_merge \
    ${LLAMA_3:+--llama3_path "${LLAMA_3}"}

python -m streamchat_tpu.eval.scoring \
    --output_dir "${JUDGE_DIR}" \
    --output_name streamingbench_merge
