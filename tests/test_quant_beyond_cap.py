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
from test_quant_exact import make_instance


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
