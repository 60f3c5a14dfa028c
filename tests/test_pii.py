"""op-65: PII detection + redaction — gate-grade local mirror (the op-59
pattern): the SAME pattern strings must count and rewrite identically
under Spark's Java regex and DuckDB's RE2 on a planted corpus, redaction
must be idempotent and null-preserving, and the curation wiring must
scrub every packed doc while the default stays bit-identical."""

import duckdb
import pytest
from pyspark.sql import functions as F

from kgc.operators.pii import EMAIL_RE, IPV4_RE, PHONE_RE, pii_features, redact_pii

ROWS = [
    (1, "contact john.doe+spam@mail.example.org for details"),
    (2, "call +1 (555) 123-4567 or 555 987 6543 now"),
    (3, "server at 192.168.1.1 and 10.0.0.255 responded"),
    (4, "mixed: a@b.co, 8.8.8.8, and (020) 7946-0958 today"),
    (5, "clean prose with no personal data at all"),
    (6, None),
    (7, ""),
    (8, "v1.2.3.4 release notes"),  # version quad: documented IP false positive
]


def _docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def _duck():
    con = duckdb.connect()
    con.execute("create table docs(doc_id bigint, text varchar)")
    con.executemany("insert into docs values (?, ?)", ROWS)
    return con


class TestPiiMirror:
    def test_counts_match_duckdb(self, spark):
        got = sorted(map(tuple, pii_features(_docs(spark)).collect()))
        con = _duck()
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                select doc_id,
                       len(regexp_extract_all(coalesce(text, ''), '{EMAIL_RE}')) as email_count,
                       len(regexp_extract_all(coalesce(text, ''), '{IPV4_RE}')) as ip_count,
                       len(regexp_extract_all(coalesce(text, ''), '{PHONE_RE}')) as phone_count,
                       email_count + ip_count + phone_count as pii_count,
                       pii_count > 0 as has_pii
                from docs
                """
            ).fetchall()
        )
        assert got == want
        by_id = {r[0]: r for r in got}
        assert by_id[1][1] == 1 and by_id[2][3] == 2  # planted expectations
        assert by_id[3][2] == 2 and by_id[4][4] == 3
        assert not by_id[5][5] and not by_id[6][5] and not by_id[7][5]
        assert by_id[8][2] == 1  # the version-quad tradeoff, pinned visibly

    def test_redaction_matches_duckdb_idempotent_null_safe(self, spark):
        red = redact_pii(_docs(spark))
        got = sorted(map(tuple, red.collect()))
        con = _duck()
        want = sorted(
            tuple(r)
            for r in con.execute(
                f"""
                select doc_id,
                       case when text is null then null else
                         regexp_replace(regexp_replace(regexp_replace(text,
                           '{EMAIL_RE}', '[EMAIL]', 'g'),
                           '{IPV4_RE}', '[IP]', 'g'),
                           '{PHONE_RE}', '[PHONE]', 'g')
                       end as text
                from docs
                """
            ).fetchall()
        )
        assert got == want
        # idempotent: placeholders contain nothing the patterns can match
        assert sorted(map(tuple, redact_pii(red).collect())) == got
        by_id = {r[0]: r[1] for r in got}
        assert by_id[5] == ROWS[4][1]  # clean text byte-identical
        assert by_id[6] is None and by_id[7] == ""
        assert "[EMAIL]" in by_id[1] and by_id[2].count("[PHONE]") == 2
        assert "@" not in by_id[1] and "555" not in by_id[2]


class TestPiiCurationWiring:
    def _docs(self, spark):
        def filler(d):  # doc-unique content tokens: no near-dup pairs
            return " ".join(f"tok{d}x{i} the is of it and" for i in range(8))

        rows = [
            (101, f"{filler(101)} reach me at alice@example.com thanks", "en"),
            (102, f"{filler(102)} backup server 10.1.2.3 is down", "en"),
            (103, f"{filler(103)} totally clean document body", "en"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, lang string")

    def test_redact_flag_scrubs_downstream_and_default_is_unchanged(
        self, spark, tmp_path
    ):
        from kgc.plans.curate import run_curation

        docs = self._docs(spark)
        t_on = run_curation(
            spark, str(tmp_path / "on"), docs, input_fp="fp", redact_pii=True
        )
        corpus_on = t_on["corpus"].select("doc_id", "text")
        assert corpus_on.count() == 3  # nothing rejected on this corpus
        dirty = pii_features(corpus_on).filter(F.col("has_pii")).count()
        assert dirty == 0
        texts = {r["doc_id"]: r["text"] for r in corpus_on.collect()}
        assert "[EMAIL]" in texts[101] and "[IP]" in texts[102]

        t_off = run_curation(
            spark, str(tmp_path / "off"), docs, input_fp="fp"
        )
        original = {r["doc_id"]: r["text"] for r in docs.collect()}
        off_texts = {
            r["doc_id"]: r["text"]
            for r in t_off["corpus"].select("doc_id", "text").collect()
        }
        assert off_texts == original  # default path bit-identical

    def test_flag_is_a_fingerprint_parameter(self, spark, tmp_path):
        """Same workdir, flag flipped: stages must recompute, not resume
        the other flag's outputs (the ADVICE-r3 rule)."""
        from kgc.plans.curate import run_curation

        docs = self._docs(spark)
        wd = str(tmp_path / "wd")
        t_on = run_curation(spark, wd, docs, input_fp="fp", redact_pii=True)
        assert "[EMAIL]" in {
            r["doc_id"]: r["text"] for r in t_on["corpus"].collect()
        }[101]
        t_off = run_curation(spark, wd, docs, input_fp="fp")
        assert "alice@example.com" in {
            r["doc_id"]: r["text"] for r in t_off["corpus"].collect()
        }[101]
