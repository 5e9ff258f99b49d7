"""LLM prompt enhancer (optional, requires a local ollama server).

Behavioral parity target: ``enhance_prompt`` (/root/reference/
LightDiffusion.py:9949-9998) — sends the user prompt to a local llama3.2 via
ollama and returns an enriched prompt. Gated: if ollama (or the network) is
unavailable the original prompt is returned unchanged, with a log line —
unlike the reference, which would raise.
"""

from __future__ import annotations

import logging

log = logging.getLogger(__name__)

_INSTRUCTION = (
    "You are a Stable Diffusion prompt engineer. Rewrite the user's prompt "
    "into a detailed, comma-separated tag-style SD1.5 prompt. Keep the "
    "subject, add style/quality/lighting tags. Reply with the prompt only."
)


def enhance_prompt(prompt: str, model: str = "llama3.2") -> str:
    try:
        import ollama  # type: ignore
    except ImportError:
        log.info("ollama not installed; prompt enhancer disabled")
        return prompt
    try:
        resp = ollama.chat(
            model=model,
            messages=[
                {"role": "system", "content": _INSTRUCTION},
                {"role": "user", "content": prompt},
            ],
        )
        out = resp["message"]["content"].strip()
        return out or prompt
    except Exception as e:  # pragma: no cover - network-dependent
        log.warning("prompt enhancer unavailable (%s); using original", e)
        return prompt
