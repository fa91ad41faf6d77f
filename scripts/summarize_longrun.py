"""Summarize a long-horizon training run's reporter.json into a curves table.

Reads OUT/reporter.json (train/gan_trainer.py Reporter state) and prints a
per-epoch markdown table: gen/disc losses and balance, grad norms,
codebook health (dead codes, usage perplexity), nonfinite skips, and the
valid-split quality metrics (LSD / mel / SI-SNR / STOI / NSIM) scored on
the dumped wavs. This is the artifact for VERDICT r2 item 5 (long-horizon
GAN stability beyond smoke length).

Usage: python scripts/summarize_longrun.py [/tmp/longrun]
"""

import json
import sys


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/longrun"
    r = json.load(open(f"{out}/reporter.json"))
    stats = r.get("stats", r)
    epochs = sorted((k for k in stats if k.isdigit()), key=int)

    def g(ep, phase, key, fmt="{:.3f}"):
        v = stats[ep].get(phase, {}).get(key)
        return fmt.format(v) if isinstance(v, (int, float)) else "-"

    print("| ep | gen_loss | mspec | adv | fm | disc_loss | disc_total |"
          " g_grad | d_grad | dead | perp | skipG/D |"
          " v_lsd | v_mel | v_stoi | v_nsim |")
    print("|" + "---|" * 16)
    for ep in epochs:
        skips = (g(ep, "train", "generator_nonfinite_skip", "{:.0f}") + "/"
                 + g(ep, "train", "discriminator_nonfinite_skip", "{:.0f}"))
        print(
            f"| {ep} | {g(ep,'train','generator_loss')} "
            f"| {g(ep,'train','generator_multi_spectral_recon_loss')} "
            f"| {g(ep,'train','generator_adv_loss')} "
            f"| {g(ep,'train','generator_feat_match_loss','{:.4f}')} "
            f"| {g(ep,'train','discriminator_loss')} "
            f"| {g(ep,'train','discriminator_total_loss')} "
            f"| {g(ep,'train','generator_grad_norm','{:.1f}')} "
            f"| {g(ep,'train','discriminator_grad_norm','{:.1f}')} "
            f"| {g(ep,'train','rvq_dead_codes','{:.0f}')} "
            f"| {g(ep,'train','rvq_usage_perplexity','{:.3f}')} "
            f"| {skips} "
            f"| {g(ep,'valid','lsd_db')} "
            f"| {g(ep,'valid','mel_distortion','{:.4f}')} "
            f"| {g(ep,'valid','stoi','{:.4f}')} "
            f"| {g(ep,'valid','nsim','{:.4f}')} |"
        )


if __name__ == "__main__":
    main()
