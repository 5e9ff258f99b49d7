"""Session-state persistence (prompt/neg/size/cfg between runs).

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``write_parameters_to_file``  :10089 (prompt.txt: prompt, neg, w, h, cfg)
  - ``load_parameters_from_file`` :10098
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

from .. import assets


@dataclasses.dataclass
class SessionParams:
    prompt: str = ""
    neg: str = ""
    width: int = 512
    height: int = 512
    cfg: float = 7.0


def _default_path() -> Path:
    d = assets.output_dir().parent
    d.mkdir(parents=True, exist_ok=True)
    return d / "prompt.txt"


def write_parameters_to_file(params: SessionParams, path: str | Path | None = None):
    path = Path(path) if path else _default_path()
    path.write_text(
        f"prompt: {params.prompt}\n"
        f"neg: {params.neg}\n"
        f"w: {int(params.width)}\n"
        f"h: {int(params.height)}\n"
        f"cfg: {int(params.cfg)}\n",
        encoding="utf-8",
    )


def load_parameters_from_file(path: str | Path | None = None) -> SessionParams:
    path = Path(path) if path else _default_path()
    out = SessionParams()
    if not path.is_file():
        return out
    for line in path.read_text(encoding="utf-8").splitlines():
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip(), val.strip()
        if key == "prompt":
            out.prompt = val
        elif key == "neg":
            out.neg = val
        elif key == "w":
            out.width = int(val)
        elif key == "h":
            out.height = int(val)
        elif key == "cfg":
            out.cfg = float(val)
    return out
