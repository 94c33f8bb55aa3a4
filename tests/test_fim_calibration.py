"""operators/fim.py + selection.nb_calibration."""

from __future__ import annotations

from pyspark.sql import functions as F

from nacc_form_validator_spark.operators.fim import (FIM_MID, FIM_PRE,
                                                     FIM_SUF,
                                                     fim_transform)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_fim_reconstructs_original(spark):
    """PSM order carries every original byte exactly once: prefix +
    middle + suffix (re-assembled from the sentinels) == original."""
    rows = [(i, f"the quick brown fox {i} jumps over the lazy dog")
            for i in range(40)]
    out = fim_transform(_docs(spark, rows), rate=1.0).collect()
    orig = dict(rows)
    for r in out:
        assert r["fim_applied"] is True
        body = r["text"]
        assert body.startswith(FIM_PRE)
        pre_rest = body[len(FIM_PRE):].split(FIM_SUF, 1)
        suf_mid = pre_rest[1].split(FIM_MID, 1)
        prefix, suffix, middle = pre_rest[0], suf_mid[0], suf_mid[1]
        assert prefix + middle + suffix == orig[r["id"]]
        assert prefix and middle          # non-empty by construction


def test_fim_rate_and_short_docs_pass_through(spark):
    rows = [(i, "x" * 50) for i in range(200)] + [(999, "tiny")]
    out = {r["id"]: r for r in
           fim_transform(_docs(spark, rows), rate=0.5).collect()}
    applied = sum(1 for r in out.values() if r["fim_applied"])
    assert 60 <= applied <= 140           # ~half, md5-uniform
    assert out[999]["fim_applied"] is False
    assert out[999]["text"] == "tiny"     # below min_chars: untouched
    # determinism: the same input transforms identically
    again = {r["id"]: r["text"] for r in
             fim_transform(_docs(spark, rows), rate=0.5).collect()}
    assert all(again[i] == out[i]["text"] for i in again)


def test_nb_calibration_counts_and_monotone_recall(spark):
    from nacc_form_validator_spark.operators.selection import (
        nb_calibration)
    good = ("the quick brown fox jumps over the lazy dog and runs "
            "away to find that other foxes have gone with the wind")
    rows = ([(i, good + f" extra{i}", "s") for i in range(6)] +
            [(10 + i, "$$$ ### !!!", "s") for i in range(3)])
    docs = spark.createDataFrame(rows, "doc_id long, text string, "
                                 "source string")
    out = nb_calibration(docs).collect()
    n = len(rows)
    for r in out:
        assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n
    # recall is non-increasing as the threshold rises
    recalls = [r["recall"] for r in out if r["recall"] is not None]
    assert all(a >= b for a, b in zip(recalls, recalls[1:]))
    # at threshold 0 the sweep must agree with the scorer's own pred
    mid = {r["threshold"]: r for r in out}[0.0]
    assert mid["tp"] == 6 and mid["tn"] == 3


def test_fim_reconstruction_property_unicode(spark):
    """Property sweep: for 300 seeded-random strings (unicode incl.
    multibyte, whitespace, quotes), the PSM pieces re-assemble to the
    original EXACTLY — one Spark action for the whole batch."""
    import random
    rng = random.Random(99)
    alphabet = ("abc XYZ 012 \t.,;:!?'\"()[]{}<>|/\\-_=+*&^%$#@~`"
                "äöüßéèñçøå 中文字符 русский текст عربى 😀🎉\n")
    rows = []
    for i in range(300):
        n = rng.randint(8, 120)
        rows.append((i, "".join(rng.choice(alphabet)
                                for _ in range(n))))
    out = fim_transform(_docs(spark, rows), rate=1.0).collect()
    orig = dict(rows)
    for r in out:
        body = r["text"]
        prefix, rest = body[len(FIM_PRE):].split(FIM_SUF, 1)
        suffix, middle = rest.split(FIM_MID, 1)
        assert prefix + middle + suffix == orig[r["id"]], r["id"]


def test_urlcanon_idempotent_property(spark):
    """Canonicalization is idempotent: canon(canon(u)) == canon(u) for
    a seeded-random url zoo (tracking params, fragments with '?',
    ports, trailing slashes, garbage)."""
    import random

    from nacc_form_validator_spark.functions.urlcanon import (
        canonical_url)
    rng = random.Random(7)
    parts_host = ["A.Example", "b.example:443", "c.example:8080"]
    parts_path = ["", "/", "/p", "/p/q/", "/p%20x"]
    parts_q = ["", "?a=1&utm_source=x", "?z=9&a=1", "?utm_a=1"]
    parts_f = ["", "#f", "#f?x=1", "#?"]
    urls = []
    for i in range(200):
        scheme = rng.choice(["https://", "HTTP://", ""])
        u = (scheme + rng.choice(parts_host) + rng.choice(parts_path)
             + rng.choice(parts_q) + rng.choice(parts_f))
        urls.append((i, u or "empty"))
    df = spark.createDataFrame(urls, "i long, url string")
    once = canonical_url(F.col("url")).alias("c1")
    got = (df.select("i", once)
           .select("i", "c1", canonical_url(F.col("c1")).alias("c2"))
           .collect())
    for r in got:
        assert r["c1"] == r["c2"], (r["i"], r["c1"], r["c2"])
