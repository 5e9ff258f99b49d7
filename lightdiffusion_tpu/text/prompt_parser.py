"""Prompt attention-weighting syntax parser.

Behavioral parity targets (/root/reference/LightDiffusion.py):
  - ``parse_parentheses``   :4733  (split on top-level parens)
  - ``token_weights``       :4762  (nested parens ×1.1, ``(x:1.2)`` explicit)
  - ``escape_important``    :4783  (``\\(`` / ``\\)`` escapes)

Grammar (A1111/ComfyUI style):
  ``(text)``       → weight ×1.1 on text (recursively)
  ``(text:1.25)``  → weight 1.25 on text — ABSOLUTE: an explicit weight
                     replaces the ambient weight rather than multiplying it
                     (ref :4770-4776), so ``(a (b:2.0))`` gives b weight 2.0
                     and ``((x:1.5):2.0)`` gives x weight 1.5
  ``\\(`` ``\\)``  → literal parens
Unbalanced parens are treated as literal text of the current segment.
"""

from __future__ import annotations

_ESC_OPEN = "\0\1"
_ESC_CLOSE = "\0\2"


def escape_important(text: str) -> str:
    return text.replace("\\)", _ESC_CLOSE).replace("\\(", _ESC_OPEN)


def unescape_important(text: str) -> str:
    return text.replace(_ESC_CLOSE, ")").replace(_ESC_OPEN, "(")


def parse_parentheses(string: str) -> list[str]:
    """Split a string into top-level segments; parenthesised groups are kept
    whole (with their parens) as single segments."""
    out: list[str] = []
    current = ""
    nesting = 0
    for char in string:
        if char == "(":
            if nesting == 0 and current:
                out.append(current)
                current = ""
            current += char
            nesting += 1
        elif char == ")":
            nesting -= 1
            current += char
            if nesting == 0:
                out.append(current)
                current = ""
        else:
            current += char
    if current:
        out.append(current)
    return out


def token_weights(string: str, current_weight: float = 1.0) -> list[tuple[str, float]]:
    """Recursively resolve the weighting grammar → [(text, weight), ...]."""
    a = parse_parentheses(string)
    out: list[tuple[str, float]] = []
    for x in a:
        weight = current_weight
        if len(x) >= 2 and x[0] == "(" and x[-1] == ")":
            x = x[1:-1]
            xx = x.rfind(":")
            weight *= 1.1
            if xx > 0:
                try:
                    # explicit weights are ABSOLUTE (ref :4770-4776): they
                    # replace the ambient weight, not scale it
                    weight = float(x[xx + 1:])
                    x = x[:xx]
                except ValueError:
                    pass
            out += token_weights(x, weight)
        else:
            out.append((x, current_weight))
    return out


def parse_prompt_weights(text: str) -> list[tuple[str, float]]:
    """Full pipeline: escape → weight grammar → unescape. Empty segments are
    dropped."""
    parsed = token_weights(escape_important(text), 1.0)
    return [(unescape_important(t), w) for (t, w) in parsed if t != ""]
