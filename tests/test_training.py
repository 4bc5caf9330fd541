"""Training oracles (SURVEY.md §5.2.2/§5.2.3): EM must recover known m/u from
synthetic gamma mixtures; u-sampling and λ estimation sanity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import splink_ray.comparison_level_library as cll
from splink_ray import Settings, block_on
from splink_ray.settings import Comparison
from splink_ray.pipelines.training import (
    agreement_patterns,
    em_on_patterns,
    estimate_parameters_using_expectation_maximisation,
    estimate_probability_two_random_records_match,
    estimate_u_using_random_sampling,
)


def _two_comparisons(m1=0.9, u1=0.05, m2=0.8, u2=0.1):
    c1 = Comparison(
        "a",
        [
            cll.NullLevel("a"),
            cll.ExactMatchLevel("a", m_probability=m1, u_probability=u1),
            cll.ElseLevel(m_probability=1 - m1, u_probability=1 - u1),
        ],
    )
    c2 = Comparison(
        "b",
        [
            cll.NullLevel("b"),
            cll.ExactMatchLevel("b", m_probability=m2, u_probability=u2),
            cll.ElseLevel(m_probability=1 - m2, u_probability=1 - u2),
        ],
    )
    return [c1, c2]


def _synth_patterns(m, u, lam, n=400_000, seed=0, cols=("a", "b", "c")):
    """Draw gamma vectors from the FS mixture with known params.

    Three binary comparisons (7 dof) make the 7-parameter mixture
    identifiable — with only two, EM converges to a different but equally
    likely solution (splink docs note the same)."""
    rng = np.random.default_rng(seed)
    is_match = rng.random(n) < lam
    data = {}
    for i, c in enumerate(cols):
        data[f"gamma_{c}"] = np.where(
            rng.random(n) < np.where(is_match, m[i], u[i]), 1, 0
        )
    out = pd.DataFrame(data).value_counts().rename("n").reset_index()
    return out


def _mk_comp(name, m, u):
    return Comparison(
        name,
        [
            cll.NullLevel(name),
            cll.ExactMatchLevel(name, m_probability=m, u_probability=u),
            cll.ElseLevel(m_probability=1 - m, u_probability=1 - u),
        ],
    )


def test_em_recovers_known_parameters():
    true_m, true_u, true_lam = (0.92, 0.85, 0.7), (0.03, 0.12, 0.2), 0.2
    patterns = _synth_patterns(true_m, true_u, true_lam)
    comps = [_mk_comp("a", 0.6, 0.2), _mk_comp("b", 0.6, 0.3), _mk_comp("c", 0.5, 0.4)]
    res = em_on_patterns(patterns, comps, lam_init=0.05, tol=1e-8, max_iter=500)
    assert abs(res["lambda"] - true_lam) < 0.02
    for comp, tm, tu in zip(comps, true_m, true_u):
        lv = comp.non_null_levels()[0]
        assert abs(lv.m_probability - tm) < 0.03, comp.output_column_name
        assert abs(lv.u_probability - tu) < 0.02, comp.output_column_name


def test_em_convergence_history():
    patterns = _synth_patterns((0.9, 0.8), (0.05, 0.1), 0.3, n=50_000, cols=("a", "b"))
    comps = _two_comparisons()
    res = em_on_patterns(patterns, comps, lam_init=0.1, tol=1e-6, max_iter=100)
    deltas = [h["max_delta"] for h in res["history"]]
    assert deltas[-1] < 1e-6
    assert res["iterations"] == len(deltas)


@pytest.fixture()
def people_records():
    """Records with a ground-truth cluster column (like splink's fake_1000)."""
    rng = np.random.default_rng(3)
    uids, names, cities, clusters = [], [], [], []
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    for e in range(150):
        n_copies = int(rng.integers(1, 4))
        # random 10-char names: distinct entities are far apart in edit space
        name = "".join(letters[rng.integers(0, 26, 10)])
        city = f"city{e % 10}"
        for c in range(n_copies):
            uids.append(f"p{e:04d}-{c}")
            # 20% of copies get a corrupted name
            names.append(name if rng.random() > 0.2 else name[:-1] + "x")
            cities.append(city)
            clusters.append(e)
    return pa.table(
        {
            "unique_id": pa.array(uids),
            "name": pa.array(names),
            "city": pa.array(cities),
            "cluster": pa.array(clusters, pa.int64()),
        }
    )


def _people_settings():
    return Settings(
        probability_two_random_records_match=0.05,
        blocking_rules_to_generate_predictions=[block_on("city")],
        comparisons=[
            Comparison(
                "name",
                [
                    cll.NullLevel("name"),
                    cll.ExactMatchLevel("name", m_probability=0.7, u_probability=0.01),
                    cll.LevenshteinLevel("name", 2, m_probability=0.25, u_probability=0.05),
                    cll.ElseLevel(m_probability=0.05, u_probability=0.94),
                ],
            )
        ],
    )


def test_estimate_lambda(ray_session, people_records):
    import ray.data as rd

    ds = rd.from_arrow(people_records)
    lam = estimate_probability_two_random_records_match(
        ds, [block_on("cluster")], recall=1.0
    )
    n = people_records.num_rows
    # exact: within-cluster pairs / all pairs
    df = people_records.to_pandas()
    exp = df.groupby("cluster").size().apply(lambda k: k * (k - 1) / 2).sum() / (
        n * (n - 1) / 2
    )
    assert abs(lam - exp) < 1e-9


def test_estimate_u_sampling(ray_session, people_records):
    import ray.data as rd

    s = _people_settings()
    ds = rd.from_arrow(people_records)
    estimate_u_using_random_sampling(ds, s, max_pairs=30000)
    lv = s.comparisons[0].non_null_levels()
    # u for exact-match on ~150 distinct names over random pairs is small
    assert lv[0].u_probability < 0.05
    assert 0.8 < sum(x.u_probability for x in lv) < 1.2


def test_em_end_to_end_improves_params(ray_session, people_records):
    import ray.data as rd

    s = _people_settings()
    # distort starting m far from truth
    for lv in s.comparisons[0].non_null_levels():
        lv.m_probability = 0.34
    ds = rd.from_arrow(people_records)
    res = estimate_parameters_using_expectation_maximisation(
        ds, s, block_on("city"), fix_u_probabilities=False
    )
    assert res["trained_comparisons"] == ["name"]
    m_exact = s.comparisons[0].non_null_levels()[0].m_probability
    # most within-city pairs of same entity share the exact name
    assert m_exact > 0.4
    assert res["iterations"] >= 1


def test_agreement_patterns_distributed_matches_local(ray_session, people_records):
    import ray.data as rd
    from splink_ray.stages.blocking import generate_pairs
    from splink_ray.settings import make_eval_context

    s = _people_settings()
    ds = rd.from_arrow(people_records)
    pairs, _ = generate_pairs(ds, s, num_buckets=4)
    patterns = agreement_patterns(pairs, s)
    # local oracle
    pairs_tbl = pa.concat_tables(
        [pa.Table.from_pandas(pairs.to_pandas())], promote_options="default"
    )
    ctx = make_eval_context(s)
    g = s.comparisons[0].compute_gamma(pairs_tbl, ctx)
    import collections

    exp = collections.Counter(g)
    got = dict(zip(patterns["gamma_name"], patterns["n"]))
    assert got == dict(exp)
