"""Asset path resolution: checkpoints, LoRAs, embeddings, tokenizer data.

Mirrors the reference's ``folder_names_and_paths`` registry
(/root/reference/LightDiffusion.py:30-47) but without hardcoded globals or
first-run network downloads (this environment has zero egress; the reference
auto-downloads from HF Hub at :53-120 — we instead resolve whatever is already
on disk and raise a clear error otherwise).

Search order for each asset class:
  1. ``$LDT_ASSETS/<class>``   (explicit override)
  2. ``<repo>/_internal/<class>``  (drop-in compatible with the reference layout)
  3. extra dirs registered via :func:`register_path`
"""

from __future__ import annotations

import os
from pathlib import Path

SUPPORTED_EXTENSIONS = (".ckpt", ".pt", ".bin", ".pth", ".safetensors")

ASSET_CLASSES = [
    "checkpoints",
    "loras",
    "embeddings",
    "ESRGAN",
    "controlnet",
    "yolos",
    "vae_approx",  # TAESD weights
    "clip",
    "sd1_tokenizer",
    "output",
]

_extra_paths: dict[str, list[Path]] = {c: [] for c in ASSET_CLASSES}

# The CLIP tokenizer data (public OpenAI clip-vit-large-patch14
# vocab.json/merges.txt, which the reference also ships under its
# _internal/sd1_tokenizer) is VENDORED at <repo>/_internal/sd1_tokenizer —
# the package is self-contained. The mounted reference checkout remains a
# last-resort fallback dir for other asset classes in this dev environment.
_REFERENCE_INTERNAL = Path("/root/reference/_internal")


def register_path(asset_class: str, path: str | os.PathLike) -> None:
    _extra_paths.setdefault(asset_class, []).append(Path(path))


def candidate_dirs(asset_class: str) -> list[Path]:
    dirs: list[Path] = []
    env = os.environ.get("LDT_ASSETS")
    if env:
        dirs.append(Path(env) / asset_class)
    repo_root = Path(__file__).resolve().parent.parent
    dirs.append(repo_root / "_internal" / asset_class)
    dirs.extend(_extra_paths.get(asset_class, []))
    if _REFERENCE_INTERNAL.is_dir():
        dirs.append(_REFERENCE_INTERNAL / asset_class)
    return dirs


def resolve_dir(asset_class: str, must_exist: bool = True) -> Path:
    for d in candidate_dirs(asset_class):
        if d.is_dir():
            return d
    if must_exist:
        raise FileNotFoundError(
            f"no directory found for asset class {asset_class!r}; searched "
            f"{[str(d) for d in candidate_dirs(asset_class)]}. Set $LDT_ASSETS "
            f"or create _internal/{asset_class}/."
        )
    return candidate_dirs(asset_class)[-1]


def resolve_file(asset_class: str, name: str) -> Path:
    """Find a named asset file in any candidate dir (with/without extension)."""
    for d in candidate_dirs(asset_class):
        p = d / name
        if p.is_file():
            return p
        if not Path(name).suffix:
            for ext in SUPPORTED_EXTENSIONS:
                q = d / (name + ext)
                if q.is_file():
                    return q
    raise FileNotFoundError(f"asset {name!r} not found in class {asset_class!r}")


def list_files(asset_class: str) -> list[str]:
    out: list[str] = []
    for d in candidate_dirs(asset_class):
        if d.is_dir():
            for p in sorted(d.iterdir()):
                if p.suffix.lower() in SUPPORTED_EXTENSIONS:
                    out.append(p.name)
    return out


# ------------------------------------------------------ first-run bootstrap --
# Exactly the reference's HF-Hub asset list (:53-120), keyed by asset class.
# Each class downloads only when it has no matching file yet (the reference's
# per-class glob checks).
DEFAULT_ASSETS: dict[str, list[tuple[str, str]]] = {
    "checkpoints": [("Meina/MeinaMix", "Meina V10 - baked VAE.safetensors")],
    "yolos": [
        ("Bingsu/adetailer", "hand_yolov9c.pt"),
        ("Bingsu/adetailer", "face_yolov9c.pt"),
        ("Bingsu/adetailer", "person_yolov8m-seg.pt"),
        ("segments-arnaud/sam_vit_b", "sam_vit_b_01ec64.pth"),
    ],
    "ESRGAN": [("lllyasviel/Annotators", "RealESRGAN_x4plus.pth")],
    "loras": [("EvilEngine/add_detail", "add_detail.safetensors")],
    "embeddings": [("EvilEngine/badhandv4", "badhandv4.pt")],
    "vae_approx": [("madebyollin/taesd", "taesd_decoder.safetensors")],
    # vendored in-repo (self-containment); listed so a wiped install can
    # re-fetch the same public data the reference ships (ref :4892)
    "sd1_tokenizer": [
        ("openai/clip-vit-large-patch14", "vocab.json"),
        ("openai/clip-vit-large-patch14", "merges.txt"),
    ],
}


def _have_file(asset_class: str, name: str) -> bool:
    try:
        resolve_file(asset_class, name)
        return True
    except FileNotFoundError:
        return False


def ensure_downloaded(
    asset_classes: list[str] | None = None,
    downloader=None,
    root: str | os.PathLike | None = None,
) -> list[Path]:
    """First-run asset bootstrap (ref :53-120): pull each missing asset class
    from HF Hub. Gated — if huggingface_hub is not importable (or no network),
    this is a no-op returning []. ``downloader(repo_id, filename, local_dir)``
    is injectable for tests; default is ``huggingface_hub.hf_hub_download``.
    Returns the list of target dirs that were (attempted to be) populated."""
    if downloader is None:
        try:
            from huggingface_hub import hf_hub_download as downloader  # noqa
        except ImportError:
            return []
    base = Path(root) if root is not None else (
        Path(__file__).resolve().parent.parent / "_internal"
    )
    touched: list[Path] = []
    for cls in asset_classes or list(DEFAULT_ASSETS):
        entries = DEFAULT_ASSETS.get(cls, [])
        if not entries:
            continue
        # the reference's "glob is non-empty" skip — any weights file
        # satisfies the class; data-file classes (tokenizer json/txt are
        # not weights extensions) fall through to the per-file check
        if list_files(cls):
            continue
        missing = [(r, f) for (r, f) in entries if not _have_file(cls, f)]
        if not missing:
            continue
        local = base / cls
        local.mkdir(parents=True, exist_ok=True)
        for repo_id, filename in missing:
            downloader(repo_id=repo_id, filename=filename,
                       local_dir=str(local))
        touched.append(local)
    return touched


def output_dir() -> Path:
    env = os.environ.get("LDT_OUTPUT")
    if env:
        d = Path(env)
    else:
        repo_root = Path(__file__).resolve().parent.parent
        d = repo_root / "_internal" / "output"
    d.mkdir(parents=True, exist_ok=True)
    return d
