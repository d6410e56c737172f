"""Production-scale BPE vocab through the REAL file-parsing path.

VERDICT r2 item 3 fallback: the OpenAI `bpe_simple_vocab_16e6.txt.gz` is not
fetchable here (zero egress — exact failed commands in ROUND3.md), so the
loader's production path (`losses/tokenizer.py:96-107`: gzip read, header
skip, the `merges[1 : 49152-256-2+1]` slice, 49,408-entry vocab assembly,
SOT/EOT at 49406/49407) had only ever executed on ~300-merge toy files.

This module synthesizes a FULL-SIZE merges file (50,000 merge lines — more
than the slice keeps, like the real 262k-line file): a prefix of genuinely
trained byte-level-BPE merges over the whole prompt corpus (so deep merge
chains are exercised on real prompts) padded to size with enumerated
well-formed pairs. Token-by-token parity vs `transformers.CLIPTokenizer`
(the HF port of clip's SimpleTokenizer) is asserted over every text the
pipeline can feed the text encoder, at the real vocab dimensions, plus the
77-context truncation rule (reference clip.tokenize semantics,
losses/clip_loss.py:67-68).
"""
import gzip
import hashlib
import json

import pytest

from asyrp_official_tpu.losses.tokenizer import (
    SimpleTokenizer,
    bytes_to_unicode,
    tokenize,
)

transformers = pytest.importorskip("transformers")

from test_tokenizer_hf_parity import _corpus, _train_bpe  # noqa: E402

# losses/tokenizer.py:98 — the slice merges[1 : 49152-256-2+1] keeps
# lines 1..48894, i.e. 48,894 merges after the header
N_MERGES_USED = (49152 - 256 - 2 + 1) - 1
N_MERGES_IN_FILE = 50_000  # oversized like the real file; slice must truncate
VOCAB_SIZE = 256 + 256 + N_MERGES_USED + 2  # 49,408 — real CLIP vocab size


def _fullsize_merges():
    """Trained-prefix + enumerated-filler merge list, duplicate-free in both
    pair and joined-result space (a duplicate joined result would collapse a
    vocab dict entry and shrink the encoder below 49,408 on BOTH sides)."""
    trained = _train_bpe(_corpus(), n_merges=N_MERGES_IN_FILE)
    units = list(bytes_to_unicode().values())

    merges = []
    seen_pairs = set()
    seen_results = set(units) | {u + "</w>" for u in units}
    for m in trained:
        r = "".join(m)
        if m in seen_pairs or r in seen_results:
            continue
        merges.append(m)
        seen_pairs.add(m)
        seen_results.add(r)

    def fillers():
        for u in units:
            for v in units:
                yield (u, v)
        for u in units:
            for v in units:
                yield (u, v + "</w>")

    for m in fillers():
        if len(merges) >= N_MERGES_IN_FILE:
            break
        r = "".join(m)
        if m in seen_pairs or r in seen_results:
            continue
        merges.append(m)
        seen_pairs.add(m)
        seen_results.add(r)
    assert len(merges) == N_MERGES_IN_FILE
    return merges


@pytest.fixture(scope="module")
def fullsize_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bpe_fullsize")
    merges = _fullsize_merges()

    # OpenAI layout: gzip, header line, one merge per line — our loader input
    gz_path = tmp / "bpe_fullsize_vocab.txt.gz"
    with gzip.open(gz_path, "wt", encoding="utf-8") as f:
        f.write("#version: bpe-fullsize-test\n")
        f.write("\n".join(" ".join(m) for m in merges))

    # HF layout built from ONLY the merges the production slice keeps
    used = merges[:N_MERGES_USED]
    merges_path = tmp / "merges.txt"
    with open(merges_path, "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        f.write("\n".join(" ".join(m) for m in used))
    vocab = list(bytes_to_unicode().values())
    vocab = vocab + [v + "</w>" for v in vocab]
    vocab += ["".join(m) for m in used]
    vocab += ["<|startoftext|>", "<|endoftext|>"]
    assert len(vocab) == VOCAB_SIZE
    vocab_path = tmp / "vocab.json"
    with open(vocab_path, "w", encoding="utf-8") as f:
        json.dump({tok: i for i, tok in enumerate(vocab)}, f)
    return str(gz_path), str(vocab_path), str(merges_path)


def test_loader_builds_real_dimensions(fullsize_files):
    """The production parsing path at real scale: slice truncation of an
    oversized file, 49,408 unique vocab entries, specials at 49406/49407 —
    the ids the text encoder's embedding table is sized for."""
    gz_path, _, _ = fullsize_files
    ours = SimpleTokenizer(vocab_path=gz_path)
    assert len(ours.encoder) == VOCAB_SIZE == 49408
    assert len(ours.bpe_ranks) == N_MERGES_USED == 48894
    assert ours.encoder["<|startoftext|>"] == 49406
    assert ours.encoder["<|endoftext|>"] == 49407


def test_fullsize_matches_hf_clip_tokenizer(fullsize_files):
    gz_path, vocab_path, merges_path = fullsize_files
    ours = SimpleTokenizer(vocab_path=gz_path)
    hf = transformers.CLIPTokenizer(vocab_path, merges_path)
    assert hf.bos_token_id == 49406 and hf.eos_token_id == 49407

    mismatches = []
    for text in _corpus():
        a = ours.encode(text)
        b = hf(text, add_special_tokens=False)["input_ids"]
        if a != b:
            mismatches.append((text, a, b))
    assert not mismatches, mismatches[:3]


def test_77_token_truncation_keeps_eot(fullsize_files):
    """clip.tokenize(truncate=True) semantics: overflow is cut to 76 tokens
    + EOT (tokenize() docstring; reference crashes without truncate)."""
    gz_path, _, _ = fullsize_files
    ours = SimpleTokenizer(vocab_path=gz_path)
    long_text = " ".join(["a photo of a smiling face"] * 30)
    assert len(ours.encode(long_text)) + 2 > 77  # genuinely overflows
    frame = tokenize([long_text, "sad face"], tokenizer=ours)
    assert frame.shape == (2, 77)
    assert frame[0, 0] == 49406 and frame[0, 76] == 49407
    assert (frame[0] != 0).all()
    short = frame[1]
    assert short[0] == 49406 and 49407 in short[1:]


def test_corpus_ids_golden(fullsize_files):
    """Deterministic golden over every pipeline-reachable prompt: the
    trained-prefix vocab build and the encoder are both deterministic, so
    any change to the parsing/merge machinery moves this hash."""
    gz_path, _, _ = fullsize_files
    ours = SimpleTokenizer(vocab_path=gz_path)
    h = hashlib.sha256()
    for text in sorted(_corpus()):
        h.update(",".join(map(str, ours.encode(text))).encode())
        h.update(b";")
    digest = h.hexdigest()
    assert digest == GOLDEN_CORPUS_SHA256, digest


# regenerate by running this module and copying the reported digest
GOLDEN_CORPUS_SHA256 = (
    "53f74b3a47b3118ad022e2db486f7b854964cfd707c47e2c98ab9936e30ca0cd"
)
