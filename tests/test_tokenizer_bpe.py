"""CLIP BPE merge-path tests against a hand-built synthetic merges table.

The zero-egress test environment exercises `CLIPTokenizer` only in its
byte-fallback mode (`test_blocks.py::test_tokenizer_fallback`); these tests
drive the REAL merge loop (`tokenizers.py::CLIPTokenizer.bpe`) with a tiny
5-merge vocab so merge-rank order, `</w>` end-of-word handling, and cache
behavior are verified without network access. A bug here would silently
corrupt all pretrained conditioning on egress day.

Parity: reference delegates to HF (`cflearn/modules/nlp/tokenizers/clip.py:59`);
this repo implements BPE in-repo, so the merge loop itself needs coverage.
"""

import pytest

# hand-built merges table, in rank order (rank 0 first). The header line is
# skipped by _load_merges, matching the real bpe_simple_vocab_16e6 format.
SYNTH_MERGES = """#version: synthetic-test
l l
h e
he ll
hell o</w>
l o</w>
"""


@pytest.fixture()
def tok(tmp_path):
    from cflearn_tpu.modules.nlp.tokenizers import CLIPTokenizer

    path = tmp_path / "merges.txt"
    path.write_text(SYNTH_MERGES, encoding="utf-8")
    t = CLIPTokenizer(bpe_path=str(path))
    assert t.provenance == "bpe-merges"
    assert len(t.bpe_ranks) == 5
    return t


def test_merge_rank_order(tok) -> None:
    """'hello' must follow the rank ladder: (l,l)@0 fires before (h,e)@1
    even though (h,e) appears first in the word; then (he,ll)@2, then
    (hell,o</w>)@3 — ending in the single full-word symbol."""
    assert tok.bpe("hello") == "hello</w>"
    # the decoy merge (l, o</w>)@4 must lose to (l, l)@0: if the loop merged
    # in pair-iteration order instead of rank order, 'l'+'o</w>' could fire
    # first and the word would never reach 'hello</w>'
    assert "hello</w>" in tok.encoder


def test_decoy_merge_fires_when_ranked_best(tok) -> None:
    # for 'lo' the only applicable merge IS the decoy → it must fire
    assert tok.bpe("lo") == "lo</w>"


def test_end_of_word_boundary(tok) -> None:
    """`</w>` attaches to the LAST character only, and blocks merges whose
    right symbol is the plain (non-terminal) form: in 'hell' the final 'l'
    becomes 'l</w>', so (l, l)@0 does NOT apply — only (h, e)@1 does."""
    assert tok.bpe("hell") == "he l l</w>"
    # ...whereas mid-word the same pair merges fine: in 'hella' the ladder
    # (l,l)@0 → (h,e)@1 → (he,ll)@2 runs to 'hell', stopping only at the
    # unranked (hell, a</w>) pair
    assert tok.bpe("hella") == "hell a</w>"


def test_partial_merge_stops_at_unranked_pairs(tok) -> None:
    # 'helo': (h,e)@1 fires, then (l,o</w>)@4; the resulting (he,lo</w>)
    # pair has no rank, so the loop must stop with two symbols left.
    assert tok.bpe("helo") == "he lo</w>"


def test_bpe_cache(tok) -> None:
    out = tok.bpe("hello")
    assert tok.cache["hello"] == out
    # cached path returns the identical object (no recompute)
    assert tok.bpe("hello") is tok.cache["hello"]


def test_encode_uses_merged_symbols(tok) -> None:
    ids = tok.encode("hello")
    assert ids == [tok.encoder["hello</w>"]]
    # merged ids live above the 512 byte-level symbols
    assert ids[0] >= 512


def test_tokenize_sot_eot_padding(tok) -> None:
    out = tok.tokenize("hello lo")
    assert out.shape == (1, 77)
    assert out[0, 0] == tok.sot_token
    assert out[0, 1] == tok.encoder["hello</w>"]
    assert out[0, 2] == tok.encoder["lo</w>"]
    assert out[0, 3] == tok.eot_token
    assert (out[0, 4:] == 0).all()


def test_fallback_provenance() -> None:
    from cflearn_tpu.modules.nlp.tokenizers import CLIPTokenizer

    t = CLIPTokenizer(bpe_path="/nonexistent/merges.txt")
    if not t.bpe_ranks:  # zero-egress: no HF cache either
        assert t.provenance == "byte-fallback"
