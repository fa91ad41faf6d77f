#!/usr/bin/env bash
# LibriTTS codec training recipe (reference: egs/LibriTTS/codec/run.sh).
# Stages: 1 data prep (wav.scp from a LibriTTS root), 2 train, 3 encode,
# 4 decode. The reference's N-process DDP fork becomes one process over the
# local TPU mesh.

set -euo pipefail

stage=1
stop_stage=5
corpus_dir=""              # LibriTTS root with */*/*/*.wav
data_dir=data
exp_dir=exp/encodec_16k_n32
config=conf/encodec_16k_n32_600k_step.yaml
bit_width=8000

. "$(dirname "$0")"/parse_options.sh 2>/dev/null || true

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: collecting wav.scp from ${corpus_dir}"
  mkdir -p "${data_dir}/train" "${data_dir}/dev"
  find "${corpus_dir}" -name "*.wav" | sort | awk -F/ \
    '{key=$NF; sub(/\.wav$/, "", key); print key, $0}' > "${data_dir}/all.scp"
  n=$(wc -l < "${data_dir}/all.scp")
  dev_n=$(( n / 100 < 500 ? n / 100 : 500 ))
  head -n "${dev_n}" "${data_dir}/all.scp" > "${data_dir}/dev/wav.scp"
  tail -n +"$((dev_n + 1))" "${data_dir}/all.scp" > "${data_dir}/train/wav.scp"
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: training -> ${exp_dir}"
  python -m funcodec_tpu.cli.codec_train \
    --config "${config}" --output_dir "${exp_dir}" \
    --train_wav_scp "${data_dir}/train/wav.scp" \
    --valid_wav_scp "${data_dir}/dev/wav.scp"
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: encoding dev set"
  python -m funcodec_tpu.cli.codec_inference \
    --output_dir "${exp_dir}/dev_codecs" \
    --config_file "${exp_dir}/config.yaml" --model_file "${exp_dir}/latest.ckpt" \
    --data_path_and_name_and_type "${data_dir}/dev/wav.scp,speech,sound" \
    --run_mod encode --bit_width "${bit_width}"
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: decoding dev set"
  python -m funcodec_tpu.cli.codec_inference \
    --output_dir "${exp_dir}/dev_recon" \
    --config_file "${exp_dir}/config.yaml" --model_file "${exp_dir}/latest.ckpt" \
    --data_path_and_name_and_type "${exp_dir}/dev_codecs/codecs.txt,speech,codec_json" \
    --run_mod decode --bit_width "${bit_width}"
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  # objective quality scoring — the reference runs dockerized ViSQOL here
  # (reference run.sh:249-295); docker is absent, so LSD / multi-scale mel
  # distortion / SI-SNR stand in (funcodec_tpu/utils/quality.py)
  echo "stage 5: scoring reconstructions"
  python -m funcodec_tpu.cli.codec_eval \
    --ref_scp "${data_dir}/dev/wav.scp" \
    --deg_dir "${exp_dir}/dev_recon" \
    --output_dir "${exp_dir}/score"
fi
