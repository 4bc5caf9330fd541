"""Connected components vs networkx oracle (SURVEY.md §5.2.4), both solvers,
plus per-round checkpoint resume."""

import os

import networkx as nx
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from splink_ray.pipelines.clustering import (
    cluster_pairwise_predictions_at_threshold,
    compute_graph_metrics,
)


def _graphs():
    gs = {}
    gs["chain"] = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(30)]
    gs["star"] = [("n000", f"n{i:03d}") for i in range(1, 20)]
    gs["two_cliques_bridge"] = (
        [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
        + [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
        + [("a0", "b0")]
    )
    rng = np.random.default_rng(11)
    nodes = [f"r{i:03d}" for i in range(80)]
    edges = set()
    for _ in range(60):
        i, j = rng.integers(0, 80, 2)
        if i != j:
            a, b = sorted((nodes[i], nodes[j]))
            edges.add((a, b))
    gs["random"] = sorted(edges)
    return gs


def _as_predictions(edges):
    return pa.table(
        {
            "unique_id_l": pa.array([a for a, _ in edges]),
            "unique_id_r": pa.array([b for _, b in edges]),
            "match_probability": pa.array([1.0] * len(edges), pa.float64()),
        }
    )


def _nodes_table(edges, extra=()):
    ns = sorted({x for e in edges for x in e} | set(extra))
    return pa.table({"unique_id": pa.array(ns)})


def _nx_clusters(edges, all_nodes):
    g = nx.Graph()
    g.add_nodes_from(all_nodes)
    g.add_edges_from(edges)
    out = {}
    for comp in nx.connected_components(g):
        rep = min(comp)
        for n in comp:
            out[n] = rep
    return out


@pytest.mark.parametrize(
    "method,name",
    [("local", n) for n in ["chain", "star", "two_cliques_bridge", "random"]]
    # distributed solver is slow per round at 4 test CPUs — cover the two
    # topologies that stress it (long chain = max rounds; random = merges)
    + [("distributed", "chain"), ("distributed", "random")],
)
def test_cc_vs_networkx(ray_session, method, name):
    import ray.data as rd

    edges = _graphs()[name]
    extra = ["zzz_isolated"]
    records = rd.from_arrow(_nodes_table(edges, extra))
    preds = rd.from_arrow(_as_predictions(edges))
    clustered, info = cluster_pairwise_predictions_at_threshold(
        records, preds, 0.95, method=method
    )
    got = dict(zip(*[clustered.to_pandas()[c] for c in ["unique_id", "cluster_id"]]))
    exp = _nx_clusters(edges, [x for e in edges for x in e] + extra)
    assert got == exp, f"{name}/{method}"
    if method == "distributed":
        assert info["rounds"] >= 1


def test_cc_threshold_filters_edges(ray_session):
    import ray.data as rd

    preds = pa.table(
        {
            "unique_id_l": pa.array(["a", "b"]),
            "unique_id_r": pa.array(["b", "c"]),
            "match_probability": pa.array([0.99, 0.5]),
        }
    )
    records = rd.from_arrow(pa.table({"unique_id": pa.array(["a", "b", "c"])}))
    clustered, _ = cluster_pairwise_predictions_at_threshold(
        records, rd.from_arrow(preds), 0.95, method="local"
    )
    got = dict(zip(*[clustered.to_pandas()[c] for c in ["unique_id", "cluster_id"]]))
    assert got == {"a": "a", "b": "a", "c": "c"}


def test_cc_distributed_checkpoint_resume(ray_session, tmp_path):
    """Kill-and-resume: a fresh run starting from round-K checkpoints must
    converge to identical labels (north_rule resumability)."""
    import ray.data as rd

    edges = _graphs()["chain"]
    records = rd.from_arrow(_nodes_table(edges))
    preds = rd.from_arrow(_as_predictions(edges))
    ck = str(tmp_path / "cc")
    clustered, info = cluster_pairwise_predictions_at_threshold(
        records, preds, 0.95, method="distributed", checkpoint_dir=ck
    )
    full = clustered.to_pandas().sort_values("unique_id").reset_index(drop=True)
    rounds_done = info["rounds"]
    assert rounds_done >= 2
    # simulate a kill after round 2: delete later-round checkpoints, rerun
    for d in os.listdir(ck):
        if d.startswith("round=") and int(d.split("=")[1]) > 2:
            import shutil

            shutil.rmtree(os.path.join(ck, d))
    clustered2, info2 = cluster_pairwise_predictions_at_threshold(
        records, preds, 0.95, method="distributed", checkpoint_dir=ck
    )
    resumed = clustered2.to_pandas().sort_values("unique_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(full, resumed)


def test_graph_metrics(ray_session):
    import ray.data as rd

    edges = _graphs()["two_cliques_bridge"]
    records = rd.from_arrow(_nodes_table(edges))
    preds = rd.from_arrow(_as_predictions(edges))
    clustered, _ = cluster_pairwise_predictions_at_threshold(
        records, preds, 0.95, method="local"
    )
    m = compute_graph_metrics(preds, clustered, 0.95)
    nodes = m["nodes"].set_index("node")["degree"]
    assert nodes["a0"] == 5  # 4 clique + bridge
    assert nodes["a1"] == 4
    cl = m["clusters"].set_index("cluster_id")
    assert cl.loc["a0", "n_nodes"] == 10
    assert cl.loc["a0", "n_edges"] == 21
    exp_density = 2 * 21 / (10 * 9)
    assert abs(cl.loc["a0", "density"] - exp_density) < 1e-12

def test_graph_metrics_streaming_no_driver_materialization(ray_session, monkeypatch):
    """C3 scale guard: with as_pandas=False the whole metric computation is
    Dataset ops — nothing may pull O(records)/O(edges) rows to the driver
    (round-2 verdict finding #1). Enforced by making to_pandas explode."""
    import ray.data as rd
    from ray.data import Dataset

    edges = _graphs()["two_cliques_bridge"]
    records = rd.from_arrow(_nodes_table(edges))
    preds = rd.from_arrow(_as_predictions(edges))
    clustered, _ = cluster_pairwise_predictions_at_threshold(
        records, preds, 0.95, method="local"
    )

    def _boom(self, *a, **k):
        raise AssertionError("compute_graph_metrics pulled a table to the driver")

    monkeypatch.setattr(Dataset, "to_pandas", _boom)
    m = compute_graph_metrics(preds, clustered, 0.95, as_pandas=False)
    monkeypatch.undo()
    nodes = m["nodes"].to_pandas().set_index("node")["degree"]
    assert nodes["a0"] == 5
    cl = m["clusters"].to_pandas().set_index("cluster_id")
    assert cl.loc["a0", "n_nodes"] == 10
    assert cl.loc["a0", "n_edges"] == 21


def test_golden_records_argmax_tiebreak(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.pipelines.clustering import golden_records

    t = pa.table(
        {
            "cluster_id": pa.array(["c1", "c1", "c1", "c2", "c2"], pa.string()),
            "unique_id": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            "n_turns": pa.array([3, 5, 5, 1, 1], pa.int32()),
        }
    )
    out = (
        golden_records(rd.from_arrow(t).repartition(3), num_buckets=4)
        .to_pandas()
        .sort_values("cluster_id")
        .reset_index(drop=True)
    )
    # c1: max n_turns=5 tie between b,c -> min id b; c2: tie d,e -> d
    assert list(out["unique_id"]) == ["b", "d"]
    assert list(out["n_turns"]) == [5, 1]


def test_pagerank_local_equals_distributed(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from splink_ray.pipelines.clustering import pagerank

    und = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    edges = und + [(b, a) for a, b in und]
    t = pa.table(
        {"src": pa.array([e[0] for e in edges], pa.int64()),
         "dst": pa.array([e[1] for e in edges], pa.int64())}
    )
    local = (
        pagerank(rd.from_arrow(t), iters=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    dist = (
        pagerank(rd.from_arrow(t).repartition(3), iters=4, local_edge_limit=0,
                 num_buckets=4)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )
    np.testing.assert_allclose(local["rank"], dist["rank"], atol=1e-6)
    # a probability distribution (symmetric graph, no dangling mass)
    assert abs(local["rank"].sum() - 1.0) < 1e-4
    # degree-2 hub (node 2, degree 3) outranks the pendant chain
    assert local["rank"][2] == local["rank"].max()
