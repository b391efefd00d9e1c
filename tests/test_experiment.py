"""Experiment sweep harness (X1/X2/X6)."""

from minimel_spark.experiment import combo_id, grid, sweep
from minimel_spark.pipeline import PipelineConfig
from minimel_spark.sources.synth import synth_pages, synth_title_index


def test_grid_deterministic_order():
    g = grid(min_count=[1, 2], cluster_threshold=[0.4, 0.6])
    assert len(g) == 4
    assert g[0] == {"cluster_threshold": 0.4, "min_count": 1}
    assert combo_id(g[0]) == combo_id({"min_count": 1, "cluster_threshold": 0.4})
    assert combo_id(g[0]) != combo_id(g[1])


def test_sweep_one_row_per_combo(spark, tmp_path):
    pages = synth_pages(spark, n_pages=60, seed=5)
    index = synth_title_index(spark)
    out = sweep(
        spark,
        pages,
        index,
        PipelineConfig(min_count=1, max_pairs_per_block=500),
        grid(match_threshold=[0.5, 0.9]),
        workdir=str(tmp_path),
    )
    rows = out.collect()
    assert len(rows) == 2
    by_t = {r["params_json"]: r for r in rows}
    assert all(r["n_records"] > 0 and r["n_clusters"] > 0 for r in rows)
    # higher match threshold cannot merge more records into fewer clusters
    lo = by_t['{"match_threshold": 0.5}']["n_clusters"]
    hi = by_t['{"match_threshold": 0.9}']["n_clusters"]
    assert hi >= lo
    # evaluation table committed for resume/reporting
    assert (tmp_path / "evaluation").exists()
