#!/usr/bin/env bash
# Single-utterance LauraTTS demo (reference: text2speech_laura/demo.sh):
# free synthesis, or zero-shot voice cloning when a prompt wav+text is given.

set -euo pipefail

model_dir=exp/laura_tts              # trained LM (config.yaml via --config + ckpt)
codec_dir=exp/encodec_16k_n32
config=conf/text2audio_codec_lm_nq2_uni_rel_pos.yaml
# raw English text works out of the box with the built-in G2P fallback:
#   --token_type phn --token_list conf/arpabet_tokens.txt
token_list=data/tokens.txt
token_type=word
text="nothing was to be done but to put about, and return in disappointment towards the north."
prompt_text=""
prompt_audio=""
output_dir=demo_out

. "$(dirname "$0")"/parse_options.sh 2>/dev/null || true

codec_model="${codec_dir}/model.pth"
[ -f "${codec_model}" ] || codec_model="${codec_dir}/latest.ckpt"

work=$(mktemp -d)
trap 'rm -rf "${work}"' EXIT
echo "demo ${text}" > "${work}/text.scp"

extra=()
if [ -n "${prompt_audio}" ]; then
  echo "demo ${prompt_audio}" > "${work}/prompt_wav.scp"
  echo "demo ${prompt_text}" > "${work}/prompt_text.scp"
  extra+=(--prompt_wav_scp "${work}/prompt_wav.scp" --prompt_text_scp "${work}/prompt_text.scp")
fi

python -m funcodec_tpu.cli.text2audio_inference \
  --output_dir "${output_dir}" \
  --config_file "${config}" --model_file "${model_dir}/latest.ckpt" \
  --codec_config_file "${codec_dir}/config.yaml" --codec_model_file "${codec_model}" \
  --text_scp "${work}/text.scp" \
  --token_list "${token_list}" --token_type "${token_type}" \
  --sampling 25 "${extra[@]}"

echo "wavs written to ${output_dir}/ (demo_gen.wav, demo_gen_only_lm.wav)"
