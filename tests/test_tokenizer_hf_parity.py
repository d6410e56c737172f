"""BPE tokenizer CROSS-parity (VERDICT r1 item 4, zero-egress variant).

The real OpenAI merges file cannot be fetched here, so the strongest
available verification is algorithmic equivalence against an independent
implementation: `transformers.CLIPTokenizer` (the HF port of `clip`'s
SimpleTokenizer, byte-for-byte compatible with `clip.tokenize`), built from
LOCAL vocab/merges files we synthesize by actually training byte-level BPE
on the full prompt corpus (107 attribute pairs + CLIP templates). Every
text the pipeline can feed the text encoder is compared token-by-token.

With the real `bpe_simple_vocab_16e6.txt.gz` dropped into assets/, the same
equivalence transfers to real CLIP ids (same loader slicing, same algorithm).
"""
import gzip
import json
import os
from collections import Counter

import pytest

from asyrp_official_tpu.losses.tokenizer import (
    SimpleTokenizer,
    bytes_to_unicode,
    tokenize,
    whitespace_clean,
    basic_clean,
    _WORD_PAT,
)
from asyrp_official_tpu.utils import assets

transformers = pytest.importorskip("transformers")


def _corpus():
    texts = []
    for src, trg in assets.src_trg_prompts().values():
        texts.extend(list(src) + list(trg))
    for lst in assets.clip_templates().values():
        texts.extend(t.format("face") for t in lst)
    texts += [
        "a photo of a smiling face.",
        "it's 3 o'clock!!! isn't it?",
        "café naïve — unicode",
        "ALL CAPS MiXeD case",
        "hyphen-ated   spaced\ttabs",
        "numbers 0123456789 42nd",
    ]
    return texts


def _train_bpe(texts, n_merges=300):
    """Minimal byte-level BPE trainer (the scheme CLIP's vocab was built
    with): words split by the CLIP regex, bytes mapped via bytes_to_unicode,
    trailing `</w>`, most-frequent adjacent pair merged iteratively."""
    b2u = bytes_to_unicode()
    words = Counter()
    for t in texts:
        t = whitespace_clean(basic_clean(t)).lower()
        for tok in _WORD_PAT.findall(t):
            enc = "".join(b2u[b] for b in tok.encode("utf-8"))
            words[tuple(enc[:-1]) + (enc[-1] + "</w>",)] += 1
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for w, c in words.items():
            for a, b in zip(w[:-1], w[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (a, b), _cnt = pairs.most_common(1)[0]
        merges.append((a, b))
        new_words = Counter()
        for w, c in words.items():
            out, i = [], 0
            while i < len(w):
                if i < len(w) - 1 and w[i] == a and w[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(w[i])
                    i += 1
            new_words[tuple(out)] += c
        words = new_words
    return merges


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bpe")
    merges = _train_bpe(_corpus())

    # OpenAI layout (gz, header line, merges) — our loader's input
    gz_path = tmp / "bpe_vocab.txt.gz"
    with gzip.open(gz_path, "wt", encoding="utf-8") as f:
        f.write("#version: bpe-test\n")
        f.write("\n".join(" ".join(m) for m in merges))

    # HF layout: merges.txt (same header convention) + vocab.json built the
    # OpenAI way: 256 bytes, 256 byte</w>, merge joins, 2 specials
    merges_path = tmp / "merges.txt"
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in merges))
    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in merges]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    vocab_path = tmp / "vocab.json"
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump({tok: i for i, tok in enumerate(vocab)}, f)
    return str(gz_path), str(vocab_path), str(merges_path)


def test_bpe_matches_hf_clip_tokenizer(vocab_files):
    gz_path, vocab_path, merges_path = vocab_files
    ours = SimpleTokenizer(vocab_path=gz_path)
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)

    assert hf.bos_token_id == ours.encoder["<|startoftext|>"]
    assert hf.eos_token_id == ours.encoder["<|endoftext|>"]

    mismatches = []
    for text in _corpus():
        a = ours.encode(text)
        b = hf(text, add_special_tokens=False)["input_ids"]
        if a != b:
            mismatches.append((text, a, b))
    assert not mismatches, mismatches[:3]


def test_tokenize_frame_matches_hf(vocab_files):
    """The [N, 77] framing (SOT ... EOT zero-padded) == clip.tokenize's."""
    import numpy as np

    gz_path, vocab_path, merges_path = vocab_files
    ours = SimpleTokenizer(vocab_path=gz_path)
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)
    texts = ["a photo of a smiling face.", "sad face"]
    frame = tokenize(texts, tokenizer=ours)
    assert frame.shape == (2, 77)
    for i, t in enumerate(texts):
        ids = [hf.bos_token_id] + hf(t, add_special_tokens=False)["input_ids"] + [hf.eos_token_id]
        assert frame[i, : len(ids)].tolist() == ids
        assert (frame[i, len(ids):] == 0).all()


def test_decode_roundtrip(vocab_files):
    """decode(encode(x)) re-spaces word boundaries (the `</w>` marker) —
    same lossy-wrt-punctuation-spacing behavior as `clip`'s decoder."""
    gz_path, _, _ = vocab_files
    ours = SimpleTokenizer(vocab_path=gz_path)
    cases = {
        "a photo of a smiling face.": "a photo of a smiling face .",
        # the CLIP regex emits each digit as its own token ([\p{N}])
        "numbers 0123456789 42nd": "numbers 0 1 2 3 4 5 6 7 8 9 4 2 nd",
    }
    for text, expect in cases.items():
        assert ours.decode(ours.encode(text)).strip() == expect
