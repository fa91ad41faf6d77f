#!/usr/bin/env bash
# Batch encoding/decoding driver — the public FunCodec workflow
# (reference: egs/LibriTTS/codec/encoding_decoding.sh stages 1-2),
# running on the TPU-native CLI. Stage 0 (model download) is left to the
# user: point --model_dir at a directory holding config.yaml + model.pth
# (released FunCodec checkpoints load directly) or a native .ckpt.

set -euo pipefail

stage=1
stop_stage=2
model_dir=""
wav_scp=""
out_dir="exp/enc_dec"
bit_width=8000
sampling_rate=16000
file_sampling_rate=16000
batch_size=8
indices_save_type=json   # json -> codecs.txt, ark -> indices.ark/scp

. "$(dirname "$0")"/parse_options.sh 2>/dev/null || true

model_file="${model_dir}/model.pth"
[ -f "${model_file}" ] || model_file="${model_dir}/latest.ckpt"

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "stage 1: encode ${wav_scp} -> ${out_dir}/codecs"
  python -m funcodec_tpu.cli.codec_inference \
    --output_dir "${out_dir}/codecs" \
    --config_file "${model_dir}/config.yaml" \
    --model_file "${model_file}" \
    --data_path_and_name_and_type "${wav_scp},speech,sound" \
    --run_mod encode --batch_size "${batch_size}" \
    --bit_width "${bit_width}" --sampling_rate "${sampling_rate}" \
    --file_sampling_rate "${file_sampling_rate}" \
    --indices_save_type "${indices_save_type}"
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: decode ${out_dir}/codecs/codecs.txt -> ${out_dir}/wavs"
  python -m funcodec_tpu.cli.codec_inference \
    --output_dir "${out_dir}/wavs" \
    --config_file "${model_dir}/config.yaml" \
    --model_file "${model_file}" \
    --data_path_and_name_and_type "${out_dir}/codecs/codecs.txt,speech,codec_json" \
    --run_mod decode --batch_size "${batch_size}" \
    --bit_width "${bit_width}" --sampling_rate "${sampling_rate}" \
    --file_sampling_rate "${file_sampling_rate}"
fi

echo "done."
