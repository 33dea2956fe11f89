"""IVF ANN: exact-mode equivalence + recall of the approximate mode."""

from pyspark.sql import functions as F

from cyclegraph_spark.operators.similarity import (
    cosine_topk,
    ivf_index,
    ivf_topk,
    reference_cosine_topk,
)

SF = "/root/testdata/sf0.001/embeddings.parquet"
K = 10
N_CELLS = 8


def _setup(spark):
    e = spark.read.parquet(SF)
    qvec = [float(x) for x in e.filter(F.col("vec_id") == 0).first()["embedding"]]
    base = e.filter(F.col("vec_id") != 0)
    return base, qvec


def test_ivf_full_probe_equals_exact(spark):
    """nprobe = n_cells must reproduce brute force exactly — proves the
    assignment is a partition (each vector in exactly one cell)."""
    base, qvec = _setup(spark)
    assigned, centroids = ivf_index(base, n_cells=N_CELLS)
    assert assigned.count() == base.count()
    assert assigned.select("vec_id").distinct().count() == base.count()
    got = [(r.vec_id, round(r.cos_sim, 6)) for r in ivf_topk(assigned, centroids, qvec, k=K, nprobe=N_CELLS).collect()]
    exp = [(r.vec_id, round(r.cos_sim, 6)) for r in cosine_topk(base, qvec, k=K).collect()]
    assert got == exp
    # and both agree with the single-node twin
    rows = [(r.vec_id, list(r.embedding)) for r in base.collect()]
    twin = [(i, round(c, 6)) for i, c in reference_cosine_topk(rows, qvec, k=K)]
    assert got == twin


def test_ivf_probe_recall(spark):
    """Probing half the cells must recover most of the true top-k (the
    query's neighbors concentrate in the cells nearest the query)."""
    base, qvec = _setup(spark)
    assigned, centroids = ivf_index(base, n_cells=N_CELLS)
    exact = {r.vec_id for r in cosine_topk(base, qvec, k=K).collect()}
    approx = {
        r.vec_id for r in ivf_topk(assigned, centroids, qvec, k=K, nprobe=N_CELLS // 2).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall@{K} = {recall} with nprobe={N_CELLS // 2}"
    # candidate set genuinely shrank — this is an ANN, not a rename
    n_cand = assigned.filter(F.col("cell").isin(
        [i for _, i in sorted(
            (sum((a - b) ** 2 for a, b in zip(qvec, c)), i) for i, c in enumerate(centroids)
        )[: N_CELLS // 2]]
    )).count()
    assert n_cand < base.count()


def _scan_num_partitions(df) -> int:
    """numPartitions metric of the (single) parquet scan in df's EXECUTED
    plan — the count of hive-style partitions actually read. Walks the
    physical tree through AQE/QueryStage wrappers via py4j; requires an
    action to have run on df."""
    def walk(node, out):
        name = node.getClass().getSimpleName()
        if "FileSourceScan" in name:
            out.append(node)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i), out)
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan(), out)
        if "QueryStageExec" in name:
            walk(node.plan(), out)
        return out

    scans = walk(df._jdf.queryExecution().executedPlan(), [])
    assert len(scans) == 1, f"expected one parquet scan, found {len(scans)}"
    m = scans[0].metrics()
    return int(m.apply("numPartitions").value())


def test_ivf_partitioned_store_prunes_at_probe(spark, tmp_path):
    """The 100-TB claim made concrete: materialize the assigned table
    partitionBy(cell); a probe's cell filter must reach the scan as a
    PartitionFilter (reading only nprobe/n_cells of the store), and the
    pruned path must return exactly the unpartitioned answer."""
    base, qvec = _setup(spark)
    assigned, centroids = ivf_index(base, n_cells=N_CELLS)
    store = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("cell").parquet(store)

    stored = spark.read.parquet(store)
    nprobe = 2
    got = ivf_topk(stored, centroids, qvec, k=K, nprobe=nprobe)
    got_rows = [(r.vec_id, round(r.cos_sim, 6)) for r in got.collect()]

    plan = got._jdf.queryExecution().executedPlan().toString()
    scan = [ln for ln in plan.splitlines() if "Scan parquet" in ln or "PartitionFilters" in ln]
    assert any("PartitionFilters" in ln and "cell" in ln for ln in plan.splitlines()), (
        f"probe filter did not reach the scan as a partition filter:\n{scan}"
    )
    # the filter is pruning, not post-scan: the EXECUTED scan's own
    # numPartitions metric must equal nprobe (< the N_CELLS directories
    # the store holds) — a full read with a residual cell IN (...)
    # filter would report N_CELLS here
    all_parts = len([d for d in __import__("os").listdir(store) if d.startswith("cell=")])
    assert all_parts == N_CELLS
    read_parts = _scan_num_partitions(got)
    assert read_parts == nprobe, (
        f"scan read {read_parts} partitions; expected the {nprobe} probed "
        f"cells (store holds {all_parts})"
    )

    exp = [
        (r.vec_id, round(r.cos_sim, 6))
        for r in ivf_topk(assigned, centroids, qvec, k=K, nprobe=nprobe).collect()
    ]
    assert got_rows == exp
