#!/usr/bin/env bash
# LauraTTS recipe (reference: egs/LibriTTS/text2speech_laura/run.sh).
# Stages: 1 extract 32-group codec tokens with a trained codec,
# 2 train the codec LM with grafted codebooks, 3 synthesize.

set -euo pipefail

stage=1
stop_stage=3
data_dir=data
codec_dir=exp/encodec_16k_n32       # trained codec (config.yaml + ckpt)
exp_dir=exp/laura_tts
config=conf/text2audio_codec_lm_nq2_uni_rel_pos.yaml
token_list=${data_dir}/tokens.txt
token_type=word                      # precomputed phonemes as space-separated tokens

. "$(dirname "$0")"/parse_options.sh 2>/dev/null || true

codec_model="${codec_dir}/model.pth"
[ -f "${codec_model}" ] || codec_model="${codec_dir}/latest.ckpt"

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  for split in train dev; do
    echo "stage 1: extracting codec tokens for ${split}"
    python -m funcodec_tpu.cli.codec_inference \
      --output_dir "${exp_dir}/tokens_${split}" \
      --config_file "${codec_dir}/config.yaml" --model_file "${codec_model}" \
      --data_path_and_name_and_type "${data_dir}/${split}/wav.scp,speech,sound" \
      --run_mod encode --batch_size 8 --bit_width 16000 \
      --indices_save_type ark
  done
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "stage 2: training the codec LM"
  python -m funcodec_tpu.cli.text2audio_train \
    --config "${config}" --output_dir "${exp_dir}" \
    --train_text "${data_dir}/train/text" \
    --train_codec "${exp_dir}/tokens_train/indices.scp" \
    --valid_text "${data_dir}/dev/text" \
    --valid_codec "${exp_dir}/tokens_dev/indices.scp" \
    --token_list "${token_list}" --token_type "${token_type}" \
    --codec_init_param "${codec_model}" --codec_config "${codec_dir}/config.yaml"
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: synthesis (zero-shot if prompt scps exist)"
  extra=()
  [ -f "${data_dir}/syn/prompt_wav.scp" ] && extra+=(--prompt_wav_scp "${data_dir}/syn/prompt_wav.scp")
  [ -f "${data_dir}/syn/prompt_text" ] && extra+=(--prompt_text_scp "${data_dir}/syn/prompt_text")
  python -m funcodec_tpu.cli.text2audio_inference \
    --output_dir "${exp_dir}/syn" \
    --config_file "${config}" --model_file "${exp_dir}/latest.ckpt" \
    --codec_config_file "${codec_dir}/config.yaml" --codec_model_file "${codec_model}" \
    --text_scp "${data_dir}/syn/text" \
    --token_list "${token_list}" --token_type "${token_type}" \
    --sampling 25 "${extra[@]}"
fi
