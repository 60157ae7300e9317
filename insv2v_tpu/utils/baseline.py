"""Single source of truth for the reconstructed A100 reference baseline.

The reference repo publishes NO benchmark numbers (BASELINE.md) — the
A100 throughput used for ``vs_baseline`` is an estimate, reconstructed
as follows (full derivation + sensitivity in BASELINE.md "Estimated A100
reference throughput"):

  workload   32 frames @ 256x384, 50-step DDIM, dual CFG (3x batch),
             16-frame windows with 4 ref frames => 3 windows
             (split_batch, insv2v_run_loveu_tgve.py:12-29)
  anchor     the reference stack (torch 2.1 fp16 + xformers, README.md:21)
             runs the 20-step, 3-window chain in ~25 s on one A100
             (community-reported magnitude for SD-1.5-class video UNets
             with AnimateDiff motion layers; no official number exists)
  scaling    denoise dominates => 50-step chain ~ 25 s * 50/20 = 62.5 s
  result     32 frames / 62.5 s ~= 0.51 -> rounded to 0.55 f/s
             (round up, favouring the reference)

Sensitivity: plausible anchors 20-32 s for the 20-step chain give
0.43-0.69 f/s; A100_EST_FPS_RANGE carries that band and bench.py reports
``vs_baseline_range`` from it. The measured absolutes (MFU, p50 latency)
are the guess-free anchors to trust first.
"""

A100_EST_FPS = 0.55
A100_EST_FPS_RANGE = (0.43, 0.69)
