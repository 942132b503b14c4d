"""BPE trainer/encoder (pipelines/bpe.py) — pinned by an independent
straight-line implementation of the same spec (no SQL twin: the merge
loop is iterative state; sketch-family precedent), a zero-merge
character-count identity, the top-V cap path, and layout invariance."""

import hashlib
import re
from collections import Counter

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"
EOW = "\n"
TOKEN = re.compile(r"\S+")


def _ref_word_counts(sf_dir: str, max_words: int) -> list[tuple[str, int]]:
    texts = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])[
        "text"
    ].to_pylist()
    c = Counter()
    for t in texts:
        c.update(TOKEN.findall(t or ""))
    ordered = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return ordered[:max_words]


def _ref_train(sf_dir: str, n_merges: int, max_words: int = 50_000):
    """Independent merge loop (Counter-based, different style from the
    engine's): winner = (count DESC, pair ASC); stop below count 2."""
    wc = _ref_word_counts(sf_dir, max_words)
    seqs = {w: tuple(w) + (EOW,) for w, _ in wc}
    merges = []
    for rank in range(n_merges):
        pc = Counter()
        for w, n in wc:
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        best_pair, best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if best < 2:
            break
        l, r = best_pair
        merges.append((rank, l, r, l + r, best))
        for w, _ in wc:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best_pair:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges, seqs


def _ref_encode(sf_dir: str, n_merges: int) -> pd.DataFrame:
    merges, seqs = _ref_train(sf_dir, n_merges)
    t = pq.read_table(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    rows = []
    for did, text in zip(t["doc_id"], t["text"]):
        words = TOKEN.findall(text or "")
        toks = []
        for w in words:
            s = seqs.get(w)
            if s is None:  # outside the cap: replay merges in rank order
                s = tuple(w) + (EOW,)
                for _, l, r, m, _ in merges:
                    out, i = [], 0
                    while i < len(s):
                        if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                            out.append(m)
                            i += 2
                        else:
                            out.append(s[i])
                            i += 1
                    s = tuple(out)
            toks.append(" ".join(s))
        n_bpe = sum(len(x.split(" ")) for x in toks)
        rows.append(
            (
                int(did),
                len(words),
                n_bpe,
                hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest(),
            )
        )
    return (
        pd.DataFrame(rows, columns=["doc_id", "n_words", "n_bpe_tokens", "bpe_md5"])
        .astype({"doc_id": "int64", "n_words": "int64", "n_bpe_tokens": "int64"})
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_train_matches_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.bpe import train_bpe

    got = train_bpe(SF, n_merges=60)
    exp = pd.DataFrame(
        _ref_train(SF, 60)[0],
        columns=["rank", "left", "right", "merged", "pair_count"],
    ).astype({"rank": "int64", "pair_count": "int64"})
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) == 60  # the corpus supports 60 productive merges
    # every merged symbol concatenates its parts (round-trip invariant)
    assert (got["left"] + got["right"] == got["merged"]).all()


def test_train_cap_path_matches_reference(ray_session):
    """max_words below the true vocabulary forces the distributed
    select_k cap; the reference applies the same (count DESC, word ASC)
    rule, so merge tables must still agree exactly."""
    from pdf_ocr_api_ray.pipelines.bpe import train_bpe

    got = train_bpe(SF, n_merges=30, max_words=50)
    exp = pd.DataFrame(
        _ref_train(SF, 30, max_words=50)[0],
        columns=["rank", "left", "right", "merged", "pair_count"],
    ).astype({"rank": "int64", "pair_count": "int64"})
    pd.testing.assert_frame_equal(got, exp)


def test_encode_matches_reference(ray_session):
    from pdf_ocr_api_ray.pipelines.bpe import bpe_encode

    got = (
        bpe_encode(SF, n_merges=60)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, _ref_encode(SF, 60))
    # merges compress: strictly fewer subtokens than the raw
    # char+marker decomposition, never fewer than one per word
    assert (got["n_bpe_tokens"] >= got["n_words"]).all()


def test_zero_merges_is_character_decomposition(ray_session):
    """n_merges=0 → every word decomposes to chars + end marker, so
    n_bpe_tokens == n_chars_nonspace + n_words exactly."""
    from pdf_ocr_api_ray.pipelines.bpe import bpe_encode

    got = (
        bpe_encode(SF, n_merges=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    t = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id")
    words = t["text"].fillna("").map(lambda s: TOKEN.findall(s))
    n_chars = words.map(lambda ws: sum(len(w) for w in ws)).to_numpy()
    n_words = words.map(len).to_numpy()
    assert (got["n_words"].to_numpy() == n_words).all()
    assert (got["n_bpe_tokens"].to_numpy() == n_chars + n_words).all()


def test_layout_invariant(ray_session, tmp_path):
    """The word histogram (and hence the merge table) is a pure
    function of corpus content — identical across block layouts."""
    from pdf_ocr_api_ray.pipelines.bpe import train_bpe

    t = pq.read_table(f"{SF}/documents.parquet")
    one = tmp_path / "one"
    (one / "documents.parquet").mkdir(parents=True)
    pq.write_table(t, one / "documents.parquet" / "a.parquet")
    three = tmp_path / "three"
    (three / "documents.parquet").mkdir(parents=True)
    n = t.num_rows
    for i, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3), (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo), three / "documents.parquet" / f"p{i}.parquet")
    a = train_bpe(str(one), n_merges=40)
    b = train_bpe(str(three), n_merges=40)
    pd.testing.assert_frame_equal(a, b)
