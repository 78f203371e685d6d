"""Quantification exactness BEYOND the enumeration window (VERDICT round-2
item #5): with more free EXIST candidates than enum_cap, the iterated
windowed enumeration must still match the brute-force MIQP oracle.

Also covers the bounded ident branch-and-bound (round-2 item #8): an
adversarial dense pair graph must complete under the node budget and
return a feasible cover.
"""

from __future__ import annotations

import numpy as np

from cammiq_tpu.config import IdentFineParams
from cammiq_tpu.models.ident import solve_ident
from cammiq_tpu.models.quant import build_problem, solve_quant

from quant_oracle import oracle_miqp
from test_quant_exact import fake_index, make_instance


def test_quant_beyond_enum_cap():
    """Instances with up to 12 free candidates solved with enum_cap=6:
    the window iteration must land on the oracle optimum (or an exact
    objective tie)."""
    validated = 0
    seed = 0
    while validated < 5 and seed < 40:
        rng = np.random.default_rng(42_000 + seed)
        seed += 1
        inst = make_instance(rng, n_sp=11, per_genome_u=3, n_d=12)
        prob = build_problem(
            inst["index_u"], inst["index_d"], inst["rcount_u"],
            inst["rcount_d"], inst["cnts_u"], inst["cnts_d"], inst["nus"],
            inst["nds"], inst["glength"], inst["rl"], inst["num_reads"],
            inst["erate"], inst["fine"],
        )
        n_free = int((prob.exist0 & ~(prob.lb > 0)).sum())
        if n_free <= 6:
            continue  # not a beyond-cap instance; try another seed
        exist, cov, info = solve_quant(prob, iters=1800, outer=6,
                                       enum_cap=6, enum_iters=400)
        assert info["free_candidates"] == n_free
        assert info["enum_rounds"] >= 2, "window iteration did not engage"
        osel, ocov, oobj = oracle_miqp(
            inst["index_u"], inst["index_d"], inst["rcount_u"],
            inst["rcount_d"], inst["cnts_u"], inst["cnts_d"], inst["nus"],
            inst["nds"], inst["glength"], inst["rl"], inst["num_reads"],
            inst["erate"], inst["fine"],
        )
        assert np.isfinite(oobj)
        ours = set(np.nonzero(exist)[0].tolist())
        best = set(np.nonzero(osel)[0].tolist())
        if ours != best:
            assert info["objective"] <= oobj * (1 + 1e-4) + 1e-9, (
                f"seed {seed - 1}: set {ours} vs oracle {best}, "
                f"obj {info['objective']:.6g} vs {oobj:.6g}"
            )
        else:
            l1 = float(np.abs(cov - ocov).sum())
            assert l1 <= 1e-3 * max(1.0, float(np.abs(ocov).sum()))
        validated += 1
    assert validated == 5, f"only {validated} beyond-cap instances found"


def test_quant_bnb_matches_oracle():
    """The exact B&B stage (enum_cap < n_free <= bnb_cap) must land on
    the brute-force MIQP oracle optimum: enum_cap=4 forces every
    beyond-cap instance through the B&B tree."""
    validated = 0
    seed = 0
    while validated < 4 and seed < 40:
        rng = np.random.default_rng(91_000 + seed)
        seed += 1
        inst = make_instance(rng, n_sp=11, per_genome_u=3, n_d=12)
        prob = build_problem(
            inst["index_u"], inst["index_d"], inst["rcount_u"],
            inst["rcount_d"], inst["cnts_u"], inst["cnts_d"], inst["nus"],
            inst["nds"], inst["glength"], inst["rl"], inst["num_reads"],
            inst["erate"], inst["fine"],
        )
        n_free = int((prob.exist0 & ~(prob.lb > 0)).sum())
        if n_free <= 4:
            continue
        exist, cov, info = solve_quant(prob, iters=1800, outer=6,
                                       enum_cap=4, enum_iters=400)
        assert info["exhaustive"], info
        assert info["stopped_by"] == "bnb"
        osel, ocov, oobj = oracle_miqp(
            inst["index_u"], inst["index_d"], inst["rcount_u"],
            inst["rcount_d"], inst["cnts_u"], inst["cnts_d"], inst["nus"],
            inst["nds"], inst["glength"], inst["rl"], inst["num_reads"],
            inst["erate"], inst["fine"],
        )
        assert np.isfinite(oobj)
        ours = set(np.nonzero(exist)[0].tolist())
        best = set(np.nonzero(osel)[0].tolist())
        if ours != best:
            assert info["objective"] <= oobj * (1 + 1e-4) + 1e-9, (
                f"seed {seed - 1}: set {ours} vs oracle {best}, "
                f"obj {info['objective']:.6g} vs {oobj:.6g}"
            )
        else:
            l1 = float(np.abs(cov - ocov).sum())
            assert l1 <= 1e-3 * max(1.0, float(np.abs(ocov).sum()))
        validated += 1
    assert validated == 4, f"only {validated} B&B instances found"


def _brute_min_cover(edges, selectable):
    verts = sorted({v for e in edges for v in e if v in selectable})
    best = None
    for mask in range(1 << len(verts)):
        chosen = {verts[i] for i in range(len(verts)) if (mask >> i) & 1}
        if all(a in chosen or b in chosen for a, b in edges):
            if best is None or len(chosen) < len(best):
                best = chosen
    return best


def test_ident_dense_graph_completes_and_is_optimal():
    """Dense random pair graph over 18 undetermined genomes: the capped
    B&B must finish and (under a generous budget) still be optimal."""
    rng = np.random.default_rng(3)
    n = 20
    cnts_u = np.zeros(n)            # nobody forced in
    cnts_d = np.full(n, 100.0)      # nobody forced out
    cnts_d[0] = 0
    pair_counts = {}
    for a in range(1, n):
        for b in range(a + 1, n):
            if rng.random() < 0.45:
                pair_counts[(a, b)] = 10
    fine = IdentFineParams(unique_read_cnt_thres=10,
                           doubly_unique_read_cnt_thres=5)
    exist, redist = solve_ident(cnts_u, cnts_d, pair_counts, fine)
    # feasibility: every heavy pair is covered
    for (a, b), c in pair_counts.items():
        assert exist[a] or exist[b]
    # optimality vs brute force over the undetermined vertices
    edges = sorted(pair_counts)
    best = _brute_min_cover(edges, set(range(1, n)))
    assert int(exist.sum()) == len(best)


def test_ident_node_budget_falls_back_to_greedy():
    """A tiny node budget must trigger the 2-approx fallback, still
    producing a feasible cover (and a warning, not a hang)."""
    n = 30
    cnts_u = np.zeros(n)
    cnts_d = np.full(n, 100.0)
    cnts_d[0] = 0
    rng = np.random.default_rng(11)
    pair_counts = {}
    for a in range(1, n):
        for b in range(a + 1, n):
            if rng.random() < 0.5:
                pair_counts[(a, b)] = 10
    fine = IdentFineParams(unique_read_cnt_thres=10,
                           doubly_unique_read_cnt_thres=5)
    exist, _ = solve_ident(cnts_u, cnts_d, pair_counts, fine, max_nodes=50)
    for (a, b), c in pair_counts.items():
        assert exist[a] or exist[b]


def test_quant_bnb_exact_at_forty_free():
    """Certified B&B at the realized-in-repo scale (n_free ~ 40, the
    test_scale 50-genome regime, r4 VERDICT item 2): a SEPARABLE planted
    instance whose exact MIQP optimum is closed-form — each genome's
    in/out decision is independent (no doubly coupling, slack TOTAL
    row), so the oracle is per-genome arithmetic even where 2^40 subset
    enumeration is impossible.  The solver must return exactly the
    planted selection with the B&B certificate."""
    import warnings

    from cammiq_tpu.config import FineParams

    rng = np.random.default_rng(77)
    n_sp = 42
    n = n_sp + 1
    per = 2
    rid1 = np.repeat(np.arange(1, n), per)
    uc1 = np.ones(len(rid1), np.int64)
    lens = np.full(len(rid1), 30, np.int64)
    index_u = fake_index(rid1, np.zeros_like(rid1), uc1,
                         np.zeros_like(uc1), lens, False)
    rl = 100
    w = 1.0 * (rl - 30) / rl            # wcov per entry (uc=1, e=0)
    # planted: ~half the genomes have strong counts (optimum includes
    # them at x*=r/w), the rest have zero counts (optimum excludes:
    # including costs (0.01 w)^2 per entry > 0)
    present = rng.random(n) < 0.5
    present[0] = False
    xstar = np.where(present, rng.uniform(0.5, 3.0, n), 0.0)
    rc_u = w * xstar[rid1]              # exact, noise-free
    cnts_u = np.zeros(n)
    np.add.at(cnts_u, rid1, rc_u)
    cnts_d = np.zeros(n)
    nus = np.full(n, 10.0)
    nds = np.zeros(n)
    glength = np.full(n, 1000, np.int64)
    glength[0] = 0
    # TOTAL row slack by construction; easy_thres huge => no EXP1 lower
    # bounds => every candidate with cnts>=thres*alpha stays FREE
    fine = FineParams(read_cnt_thres=0, easy_to_identify_thres=10**9,
                      ilp_epsilon=0.01, ilp_alpha=0.0, max_cov=100.0)
    prob = build_problem(
        index_u, None, rc_u, np.zeros(0), cnts_u, cnts_d, nus, nds,
        glength, rl, 10**6, 0.0, fine)
    n_free = int((prob.exist0 & ~(prob.lb > 0)).sum())
    assert n_free >= 40, f"instance must realize n_free >= 40, got {n_free}"
    with warnings.catch_warnings():
        warnings.simplefilter("error")      # 'not proven exact' is a fail
        exist, cov, info = solve_quant(prob, iters=1500, outer=4,
                                       enum_cap=6, enum_iters=300)
    assert info["exhaustive"], info
    assert info["stopped_by"] == "bnb", info
    got = set(np.nonzero(exist)[0].tolist())
    want = set(np.nonzero(present)[0].tolist())
    assert got == want, (sorted(got ^ want), info)
    sel = exist & (xstar > 0)
    assert np.allclose(cov[sel], xstar[sel], atol=5e-3)
