"""Tests: prompt weighting grammar, self-contained BPE vs HF CLIPTokenizer,
77-token chunking, textual-inversion splice markers."""

import numpy as np
import pytest

from lightdiffusion_tpu.text.prompt_parser import (
    parse_parentheses,
    parse_prompt_weights,
    token_weights,
)
from lightdiffusion_tpu.text.tokenizer import SDTokenizer, MAX_LENGTH


# ---------- weighting grammar ----------

def test_parse_parentheses_basic():
    assert parse_parentheses("a (b) c") == ["a ", "(b)", " c"]
    assert parse_parentheses("(a (b) c)") == ["(a (b) c)"]


def test_token_weights_nesting():
    w = dict(token_weights("a ((b)) (c:2.0)"))
    assert w["a "] == 1.0
    assert abs(w["b"] - 1.21) < 1e-6  # 1.1 * 1.1
    assert w["c"] == 2.0


def test_token_weights_explicit_overrides_paren():
    out = token_weights("(x:1.5)")
    assert out == [("x", 1.5)]


def test_nested_explicit_weight_is_absolute():
    """Explicit ``(x:w)`` weights REPLACE the ambient weight (ref
    :4770-4776) — the innermost explicit weight wins outright."""
    out = dict(token_weights("((x:1.5):2.0)"))
    assert abs(out["x"] - 1.5) < 1e-6
    out = dict(token_weights("(a (b:2.0))"))
    assert abs(out["b"] - 2.0) < 1e-6  # NOT 2.2 (= 2.0 * 1.1)
    assert abs(out["a "] - 1.1) < 1e-6


def _ref_token_weights(string, current_weight=1.0):
    """Independent reimplementation of the reference's weighting semantics
    (ref :4762-4781) for property comparison: recursive descent over the
    raw string, ×1.1 per paren level, explicit ``:w`` absolute."""
    out = []
    i, text = 0, ""
    while i < len(string):
        ch = string[i]
        if ch == "(":
            # find the matching close paren
            depth, j = 1, i + 1
            while j < len(string) and depth:
                depth += string[j] == "("
                depth -= string[j] == ")"
                j += 1
            if depth:  # unbalanced: literal
                text += string[i:]
                i = len(string)
                break
            if text:
                out.append((text, current_weight))
                text = ""
            inner = string[i + 1 : j - 1]
            w = current_weight * 1.1
            xx = inner.rfind(":")
            if xx > 0:
                try:
                    w = float(inner[xx + 1 :])
                    inner = inner[:xx]
                except ValueError:
                    pass
            out += _ref_token_weights(inner, w)
            i = j
        else:
            text += ch
            i += 1
    if text:
        out.append((text, current_weight))
    return out


def test_token_weights_property_vs_independent_impl():
    """Property-compare the char-loop parser against an independently
    structured recursive-descent implementation of the same grammar on a
    nested-weight corpus (VERDICT r3 #3 done-criterion)."""
    corpus = [
        "plain text",
        "a (b) c",
        "a ((b)) (c:2.0)",
        "((x:1.5):2.0)",
        "(a (b:2.0))",
        "(a:0.5) ((b:1.2) c)",
        "((a (b:2.0) c):0.8)",
        "(((deep)))",
        "(a:1.5",          # unbalanced open
        "a) b",            # unbalanced close
        "(a:b)",           # non-float weight
        "(x:-1.0)",
        "one (two (three:3.0) four) five",
    ]
    for prompt in corpus:
        got = token_weights(prompt)
        want = _ref_token_weights(prompt)
        assert len(got) == len(want), (prompt, got, want)
        for (gt, gw), (wt, ww) in zip(got, want):
            assert gt == wt, (prompt, got, want)
            assert abs(gw - ww) < 1e-9, (prompt, got, want)


def test_escapes():
    out = parse_prompt_weights(r"a \(literal\) (b:1.3)")
    assert ("a (literal) ", 1.0) in out
    assert ("b", 1.3) in out


def test_bad_weight_is_text():
    out = token_weights("(a:b)")
    # ":b" not parseable as float → falls back to 1.1 weighted full text
    assert out == [("a:b", pytest.approx(1.1))]


# ---------- BPE ----------

@pytest.fixture(scope="module")
def tok():
    return SDTokenizer()


def test_bpe_against_hf(tok):
    transformers = pytest.importorskip("transformers")
    from lightdiffusion_tpu import assets

    hf = transformers.CLIPTokenizer.from_pretrained(
        str(assets.resolve_dir("sd1_tokenizer"))
    )
    prompts = [
        "a photo of a cat",
        "masterpiece, best quality, 1girl, solo, looking at viewer",
        "Hello WORLD!!! çafé ünïcode 北京 🎉",
        "it's a test-case; weird   spacing\tand\nnewlines",
        "",
    ]
    for p in prompts:
        ours = tok.bpe.encode(p)
        theirs = hf(p, add_special_tokens=False)["input_ids"]
        assert ours == theirs, p


def test_chunk_layout(tok):
    chunks = tok.tokenize_with_weights("a photo of a cat")
    assert chunks.ids.shape == (1, MAX_LENGTH)
    ids = chunks.ids[0]
    assert ids[0] == tok.bos
    payload = tok.bpe.encode("a photo of a cat")
    assert list(ids[1 : 1 + len(payload)]) == payload
    assert ids[1 + len(payload)] == tok.eos
    assert np.all(ids[2 + len(payload):] == tok.pad)


def test_long_prompt_chunks_on_word_boundary(tok):
    # 60 multi-token words → must spill into ≥2 chunks, no word split
    word = "photorealistic"
    n_ids = len(tok.bpe.encode(word))
    assert n_ids > 1
    words = 60
    chunks = tok.tokenize_with_weights(" ".join([word] * words))
    assert chunks.ids.shape[0] >= 2
    # EOS shares the pad id, so non-pad non-bos tokens == payload exactly
    total_payload = sum(
        int(np.sum((row != tok.pad) & (row != tok.bos))) for row in chunks.ids
    )
    assert total_payload == words * n_ids
    # each chunk's payload is a multiple of the word's token count
    for row in chunks.ids:
        payload = int(np.sum((row != tok.pad) & (row != tok.bos)))
        assert payload % n_ids == 0


def test_weights_align_with_tokens(tok):
    chunks = tok.tokenize_with_weights("plain (weighted:1.5) tail")
    ids, w = chunks.ids[0], chunks.weights[0]
    n_plain = len(tok.bpe.encode("plain"))
    n_weighted = len(tok.bpe.encode("weighted"))
    assert np.all(w[1 : 1 + n_plain] == 1.0)
    assert np.all(w[1 + n_plain : 1 + n_plain + n_weighted] == 1.5)


def test_missing_embedding_skipped(tok):
    chunks = tok.tokenize_with_weights("embedding:doesnotexist a cat")
    assert chunks.embeddings == []
    payload = tok.bpe.encode("a cat")
    assert list(chunks.ids[0][1 : 1 + len(payload)]) == payload


def test_embedding_splice(tmp_path):
    import safetensors.numpy as st

    emb = np.random.RandomState(0).randn(3, 768).astype(np.float32)
    st.save_file({"emb_params": emb}, str(tmp_path / "myembed.safetensors"))
    tok = SDTokenizer(embedding_dir=tmp_path)
    chunks = tok.tokenize_with_weights("embedding:myembed a cat")
    assert len(chunks.embeddings) == 1
    np.testing.assert_allclose(chunks.embeddings[0], emb)
    assert list(chunks.ids[0][1:4]) == [-1, -1, -1]


def test_empty_prompt_single_chunk(tok):
    chunks = tok.tokenize_with_weights("")
    assert chunks.ids.shape == (1, MAX_LENGTH)
    assert chunks.ids[0][0] == tok.bos
    assert chunks.ids[0][1] == tok.eos
