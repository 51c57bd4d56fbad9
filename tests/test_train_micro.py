"""Trainer convergence proofs (VERDICT r4 #2), reduced-step in-suite versions.

Each test TRAINS one of the GAN/distill paths on synthetic data and asserts
the loss trajectory / the consistency property — not just step finiteness.
The full-length runs (with curves recorded in DESIGN.md) live in
tools/train_micro.py; these call the same experiment functions with step
counts tuned to stay a few minutes total while keeping the same assertion
thresholds comfortably cleared (measured margins in DESIGN.md).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from train_micro import lcm_distill_micro, vae_gan_micro, vocoder_gan_micro


def test_vae_gan_micro_overfit_past_disc_start():
    """Rec loss halves, adaptive d_weight engages and stays sane past
    disc_start, disc separates real from fake, nothing blows up."""
    vae_gan_micro(steps=160, disc_start=40, verbose=False)


def test_vocoder_gan_tone_overfit():
    """mel-L1 falls >60% on an AM tone and the reconstruction's spectrum is
    dominated by the carrier's bin (audibly a tone)."""
    vocoder_gan_micro(steps=400, verbose=False)


def test_lcm_distill_consistency_property():
    """Train a tiny teacher, distill it, and assert the 2-step student lands
    near the teacher's 100-step CFG-DDIM endpoint — the consistency property
    itself, not just finite losses."""
    lcm_distill_micro(teacher_steps=1000, distill_steps=800, verbose=False)
