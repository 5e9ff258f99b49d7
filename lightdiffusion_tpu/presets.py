"""Measured accelerator preset stacks, shared by every frontend.

name -> (deepcache_interval, todo_factor, uncond_interval). The numbers
come from the on-chip DC x ToDo grid, the uncond_interval sweep, and the
DC x ui composition sweep (scratch/dual_tune.py; NOTES_ROUND3):

  fast    = DeepCache-3 + ui-2 + ToDo-2  (~1.9x, ssim 0.992)
  max     = DeepCache-4 + ui-2 + ToDo-4  (~2.2x, ssim 0.989)
  quality = uncond-interval-2 alone      (~1.2x, ssim 0.994)

Each stack's SSIM is re-measured per bench run (bench.py quality gates),
not assumed. The reference has no equivalent surface — its only
accelerator is the all-or-nothing stable-fast compile toggle
(/root/reference/LightDiffusion.py:10184-10220).
"""

PRESETS = {
    "fast": (3, 2, 2),
    "max": (4, 4, 2),
    "quality": (0, 0, 2),
}


def resolve(preset: str, *, deepcache: int | None = None,
            uncond_interval: int | None = None, todo: int | None = None):
    """(deepcache, todo, uncond_interval) for a named preset under the
    override rules every frontend shares: explicit values win — including
    explicit zeros — and passing either of deepcache/uncond_interval
    suppresses the preset's other knob (the measured stacks are tuned as a
    unit; explicit values may still combine the two, they compose).
    Raises ValueError naming the valid presets for unknown names."""
    if preset not in PRESETS:
        raise ValueError(
            f"unknown preset {preset!r}; valid presets: {sorted(PRESETS)}"
        )
    dc, td, ui = PRESETS[preset]
    if deepcache is not None or uncond_interval is not None:
        dc = deepcache if deepcache is not None else 0
        ui = uncond_interval if uncond_interval is not None else 0
    if todo is not None:
        td = todo
    return dc, td, ui
