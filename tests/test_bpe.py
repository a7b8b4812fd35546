"""Mini-BPE tokenizer gates: golden regen (frozen merges == fresh training),
pinned encodings, round-trip property, and Spark-vs-kernel equality for the
token-true entries (their rows-only status is backed by these, per the
kernel-is-the-reference invariant)."""

from __future__ import annotations

import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from ocrautomator_spark.kernel import bpe

SF_DIR = "/root/testdata/sf0.001"


def _corpus_texts() -> list[str]:
    return (
        pq.read_table(f"{SF_DIR}/documents.parquet", columns=["text"])
        .column("text")
        .to_pylist()
    )


def test_frozen_merges_regen_exactly():
    """The golden table IS a fresh deterministic training run on the corpus —
    any drift in corpus, tie-break, or algorithm fails here instead of
    silently shifting every downstream token count."""
    assert bpe.train_bpe(_corpus_texts()) == bpe.load_merges()


def test_frozen_table_shape():
    merges = bpe.load_merges()
    assert len(merges) == bpe.N_MERGES == 48
    assert all(isinstance(a, str) and isinstance(b, str) and a and b for a, b in merges)


def test_pinned_encodings():
    tok = bpe.default_tokenizer()
    # pinned against the frozen table (regen-gated above): a fully-merged
    # frequent word, two sub-word splits, and an out-of-vocabulary word
    assert tok.encode_word("window") == ("window</w>",)
    assert tok.encode_word("the") == ("t", "h", "e</w>")
    assert tok.encode_word("customer") == ("c", "u", "st", "o", "m", "er</w>")
    assert tok.encode_word("zzz") == ("z", "z", "z", "</w>")


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet="abcdefghijklmnopqrstuvwxyz ._0-9\t\n", max_size=120))
def test_roundtrip_and_count(s):
    tok = bpe.default_tokenizer()
    toks = tok.encode(s)
    assert tok.count(s) == len(toks)
    joined = "".join(toks).replace(bpe.END_OF_WORD, " ").strip()
    assert joined == " ".join(bpe.pretokenize(s))
    # every word ends in exactly one end-of-word marker
    assert "".join(toks).count(bpe.END_OF_WORD) == len(bpe.pretokenize(s))


def test_token_stats_bpe_matches_kernel(spark):
    """Distributed counts == sequential kernel counts, 100%."""
    from ocrautomator_spark.queries import pipeline_ops as po

    tok = bpe.default_tokenizer()
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    expect = {
        int(i): tok.count(t)
        for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    }
    got = {
        r["doc_id"]: r["n_bpe_true"]
        for r in po.QUERIES["token_stats_bpe"](spark, SF_DIR).collect()
    }
    assert got == expect


def test_pack_tokens_matches_python_reference(spark):
    """The sharded two-pass token packing equals a single pure-Python
    cumulative scan (same contract the char variant pins across shard
    widths)."""
    from collections import Counter

    from ocrautomator_spark.queries import pipeline_ops as po

    tok = bpe.default_tokenizer()
    tbl = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    docs = sorted(
        (int(i), tok.count(t))
        for i, t in zip(tbl.column("doc_id").to_pylist(), tbl.column("text").to_pylist())
    )
    cum = 0
    nd: Counter = Counter()
    tot: Counter = Counter()
    for _, n in docs:
        b = cum // po.PACK_BIN_TOKENS
        nd[b] += 1
        tot[b] += n
        cum += n
    got = {
        r["bin_id"]: (r["n_docs"], r["bin_tokens"])
        for r in po.QUERIES["pack_contiguous_bins_tokens"](spark, SF_DIR).collect()
    }
    assert got == {b: (nd[b], tot[b]) for b in nd}
