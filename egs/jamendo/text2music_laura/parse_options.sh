#!/usr/bin/env bash
# Minimal kaldi-style --name value option parser (utils/parse_options.sh role).
while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --*) name=$(echo "$1" | sed s/^--// | sed s/-/_/g)
         eval "${name}=\"$2\""
         shift 2 ;;
    *) break ;;
  esac
done
