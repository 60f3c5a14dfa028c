"""T3 property tests (hypothesis): invariants that must hold for ANY input,
not just the synthetic corpus. Spark jobs per example are expensive, so
example counts are small and deadlines disabled."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kgc.operators.canon import connected_components, salted_dedup
from kgc.operators.similarity import similar_to_exact
from kgc.operators.spans import explode_spans, reassemble_spans, span_sequence_fingerprint
from kgc.schemas import DOCS, TRIPLES

SET = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

span_st = st.tuples(
    st.sampled_from(["text", "image", "video"]),
    st.one_of(st.none(), st.text(min_size=0, max_size=20)),
    st.one_of(st.none(), st.text(alphabet="abc/:.", min_size=1, max_size=12)),
)
doc_st = st.lists(span_st, min_size=0, max_size=6)


@st.composite
def docs_rows(draw):
    n = draw(st.integers(min_value=1, max_value=5))
    rows = []
    for i in range(n):
        spans = [
            (k, t, m, off * 7)  # strictly increasing offsets
            for off, (k, t, m) in enumerate(draw(doc_st))
        ]
        rows.append((f"d{i}", spans))
    return rows


class TestRoundTripProperty:
    @SET
    @given(rows=docs_rows())
    def test_explode_reassemble_preserves_span_sequence(self, spark, rows):
        docs = spark.createDataFrame(rows, DOCS)
        back = reassemble_spans(explode_spans(docs), all_docs=docs)
        a = {r["doc_id"]: (r["span_fp"], r["n_spans"]) for r in span_sequence_fingerprint(docs).collect()}
        b = {r["doc_id"]: (r["span_fp"], r["n_spans"]) for r in span_sequence_fingerprint(back).collect()}
        assert a == b


edges_st = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).map(lambda t: (f"n{t[0]}", f"n{t[1]}")),
    min_size=1,
    max_size=12,
)


class TestCCProperty:
    @SET
    @given(edges=edges_st)
    def test_cc_matches_union_find(self, spark, edges):
        df = spark.createDataFrame(edges, "src string, dst string")
        got = {r["node"]: r["component"] for r in connected_components(df).collect()}
        # reference: driver-side union-find
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comps = {}
        for n in parent:
            comps.setdefault(find(n), []).append(n)
        want = {n: min(members) for members in comps.values() for n in members}
        assert got == want


class TestDedupProperty:
    @SET
    @given(
        rows=st.lists(st.tuples(st.text("ab", max_size=3), st.integers(0, 3)), min_size=0, max_size=30),
        n_salt=st.sampled_from([1, 4, 16]),
    )
    def test_salted_dedup_equals_distinct(self, spark, rows, n_salt):
        df = spark.createDataFrame(rows, "k string, v int") if rows else spark.createDataFrame([], "k string, v int")
        got = sorted(map(tuple, salted_dedup(df, ["k", "v"], n_salt=n_salt).collect()))
        want = sorted(set(rows))
        assert got == want


class TestSimilarityProperty:
    @SET
    @given(
        touches=st.lists(
            st.tuples(st.integers(0, 5), st.integers(0, 6)).map(lambda t: (f"i{t[0]}", f"act-00{t[1]}")),
            min_size=1,
            max_size=25,
        )
    )
    def test_otsuka_ochiai_matches_brute_force(self, spark, touches):
        rows = [(i, "TOUCHED", a, None, "d", 0) for i, a in touches]
        t = spark.createDataFrame(rows, TRIPLES)
        got = {(r["ind_a"], r["ind_b"]): r["similarity"] for r in similar_to_exact(t).collect()}
        profiles = {}
        for i, a in touches:
            profiles.setdefault(i, set()).add(a)
        want = {}
        inds = sorted(profiles)
        for x in range(len(inds)):
            for y in range(x + 1, len(inds)):
                a, b = inds[x], inds[y]
                inter = len(profiles[a] & profiles[b])
                if inter >= 1:
                    want[(a, b)] = inter / math.sqrt(len(profiles[a]) * len(profiles[b]))
        assert set(got) == set(want)
        assert all(abs(got[k] - want[k]) < 1e-12 for k in want)


class TestParallelismInvariance:
    def test_fingerprints_stable_across_shuffle_partitions(self, spark):
        """§2.4-E end to end: same query, different shuffle partitioning,
        identical table fingerprint (order-independent)."""
        from kgc.plans.metrics import table_fingerprint
        from kgc.sources.synth import ground_truth_triples

        gt = ground_truth_triples(spark, 0.001)
        old = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = table_fingerprint(gt)
            spark.conf.set("spark.sql.shuffle.partitions", "17")
            b = table_fingerprint(gt)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        assert a == b

    def test_map_in_arrow_metrics_equal_builtin(self, spark):
        """op-48: the mapInArrow metrics carrier must reproduce the builtin
        partition_metrics rows bit-for-bit (same partition ids, counts, XOR
        fingerprints) — batch-level pre-reduction is exact because XOR is
        associative/commutative."""
        from kgc.plans.metrics import partition_metrics, partition_metrics_arrow
        from kgc.sources.synth import synth_documents

        docs = synth_documents(spark, 0.001).repartition(7).localCheckpoint(eager=True)
        builtin = sorted(tuple(r) for r in partition_metrics(docs, "s").collect())
        arrow = sorted(tuple(r) for r in partition_metrics_arrow(docs, "s").collect())
        assert builtin == arrow and len(builtin) == 7


class TestGreedyPacking:
    """Pure-function invariants of the op-52 packing fold (no session)."""

    @given(
        st.lists(st.integers(min_value=0, max_value=10_000), max_size=300),
        st.integers(min_value=1, max_value=2_000),
    )
    @settings(max_examples=300, deadline=None)
    def test_fold_invariants(self, tokens, budget):
        from kgc.operators.sample import greedy_bins

        bins = greedy_bins(tokens, budget)
        assert len(bins) == len(tokens)
        capped = [min(t, budget) for t in tokens]
        fills: dict[int, int] = {}
        for b, t in zip(bins, capped):
            fills[b] = fills.get(b, 0) + t
        # every bin fits the budget
        assert all(f <= budget for f in fills.values()), (fills, budget)
        # bins are consecutive 0..max and assignment is nondecreasing
        if bins:
            assert bins[0] == 0
            assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        # greedy tightness: the doc that OPENED bin i+1 would have
        # overflowed bin i (no bin was closed early)
        for i in range(1, len(bins)):
            if bins[i] == bins[i - 1] + 1:
                assert fills[bins[i - 1]] + capped[i] > budget
