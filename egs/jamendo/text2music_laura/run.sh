#!/usr/bin/env bash
# Text-to-music (Jamendo) recipe.
# Reference workflow: egs/jamendo/text2music_laura/run.sh — mp3->16k wav,
# 10s clips, tag-text -> T5 embeddings, FreqCodec tokens, codec LM training,
# synthesis. Data download/clipping (reference stages 1-3) is corpus
# preparation: produce data/{train,dev}/wav.scp (16k mono clips) and
# data/{train,dev}/text (tag sentences per clip) however you manage corpora.

set -euo pipefail

stage=1
stop_stage=4
data_dir=data
codec_dir=exp/freqcodec_16k_n32      # trained FreqCodec (config.yaml + ckpt)
exp_dir=exp/text2music_laura
config=conf/text2audio_codec_lm_nq2_uni_rel_pos.yaml
t5_model=t5-large                     # local path or HF name (needs local weights)

. "$(dirname "$0")"/parse_options.sh 2>/dev/null || true

codec_model="${codec_dir}/model.pth"
[ -f "${codec_model}" ] || codec_model="${codec_dir}/latest.ckpt"

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  for split in train dev; do
    echo "stage 1: T5 embeddings for the tag text (${split})"
    python -m funcodec_tpu.cli.extract_t5_emb \
      --text_scp "${data_dir}/${split}/text" \
      --output "${exp_dir}/t5_${split}" \
      --t5_model "${t5_model}"
  done
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  for split in train dev; do
    echo "stage 2: extracting codec tokens for ${split}"
    python -m funcodec_tpu.cli.codec_inference \
      --output_dir "${exp_dir}/tokens_${split}" \
      --config_file "${codec_dir}/config.yaml" --model_file "${codec_model}" \
      --data_path_and_name_and_type "${data_dir}/${split}/wav.scp,speech,sound" \
      --run_mod encode --batch_size 8 --bit_width 16000 \
      --indices_save_type ark
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "stage 3: training the codec LM on T5 embeddings"
  # text inputs are dense T5 embeddings (kaldi_ark), so no token list
  python -m funcodec_tpu.cli.text2audio_train \
    --config "${config}" --output_dir "${exp_dir}" \
    --train_text "${exp_dir}/t5_train/emb.scp" \
    --train_codec "${exp_dir}/tokens_train/indices.scp" \
    --valid_text "${exp_dir}/t5_dev/emb.scp" \
    --valid_codec "${exp_dir}/tokens_dev/indices.scp" \
    --codec_init_param "${codec_model}" --codec_config "${codec_dir}/config.yaml"
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "stage 4: music synthesis from tag text"
  python -m funcodec_tpu.cli.extract_t5_emb \
    --text_scp "${data_dir}/syn/text" \
    --output "${exp_dir}/t5_syn" \
    --t5_model "${t5_model}"
  python -m funcodec_tpu.cli.text2audio_inference \
    --output_dir "${exp_dir}/syn" \
    --config_file "${config}" --model_file "${exp_dir}/latest.ckpt" \
    --codec_config_file "${codec_dir}/config.yaml" --codec_model_file "${codec_model}" \
    --text_scp "${exp_dir}/t5_syn/emb.scp" --text_type ids \
    --sampling 25
fi
