"""Quantification model: the reference MIQP as a JAX-native QP + rounding.

Reference (runILP_cplex, src/query.cpp:1082-1298):

  variables   EXIST[g] in {0,1}, COV[g] in [0, max_cov]
  pre-filter  genomes failing read-count thresholds are fixed EXIST=0
              (src/query.cpp:1100-1133)
  objective   sum over index substrings s of surviving genomes:
                factor_g * (wcov(s) . COV - rcount(s))^2
              wcov(s) = ucount * (rl - depth)/rl * (1-erate)^depth,
              factor_g = 1000 / #substrings(g); doubly substrings
              contribute through both member genomes' lists
              (src/query.cpp:1151-1182)
  constraints 0.01 EXIST <= COV <= max_cov EXIST (src/query.cpp:1186-1189);
              per-genome predicted totals (1+eps) >= observed counts, only
              when nus >= easy_to_identify_thres (src/query.cpp:1191-1231);
              sum COV . glength / rl <= (1+eps) #reads
              (src/query.cpp:1234-1237)

Structure exploited here: the per-genome unique-coverage constraint is a
simple lower bound on COV[g] (EXP1 = (sum w) COV[g]), which together with
COV <= max_cov EXIST forces EXIST=1 for every constrained survivor; the
binary choice remains only for unconstrained survivors, where the (0,0.01)
"hole" is resolved by snap-and-resolve rounding.  The QP is solved with
FISTA projected gradient + augmented Lagrangian for the coupled
constraints - fully jittable, runs on device.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Tuple

import numpy as np

from ..config import FineParams
from ..index.table import FlatIndex


def prefilter(
    cnts_u: np.ndarray,
    cnts_d: np.ndarray,
    nus: np.ndarray,
    nds: np.ndarray,
    fine: FineParams,
) -> np.ndarray:
    """exist0 bool [n_species+1] (slot 0 False).  Exact reference logic
    (src/query.cpp:1100-1133): both the unique- and doubly-count tests use
    the *nus* >= easy_to_identify_thres condition."""
    n = cnts_u.shape[0]
    exist = np.ones(n, dtype=bool)
    thr = fine.read_cnt_thres
    alpha = fine.ilp_alpha
    easy = nus >= fine.easy_to_identify_thres

    d1u = cnts_u - thr
    d2u = cnts_u - nus * alpha
    exist &= np.where(easy, (d1u >= 0) & (d2u >= 0), d2u >= 0)
    d1d = cnts_d - thr
    d2d = cnts_d - nds * alpha
    exist &= np.where(easy, (d1d >= 0) & (d2d >= 0), d2d >= 0)
    exist[0] = False
    return exist


@dataclasses.dataclass
class QuantProblem:
    """Flattened QP term arrays (host numpy, species-id indexed)."""

    n: int                      # n_species + 1 (slot 0 unused)
    exist0: np.ndarray          # bool [n]
    # unique terms: uf*(uw*x[ug] - ur)^2
    ug: np.ndarray
    uw: np.ndarray
    ur: np.ndarray
    uf: np.ndarray
    # doubly terms: df*(dw1*x[dg1] + dw2*x[dg2] - dr)^2, owned by `downer`
    downer: np.ndarray
    dg1: np.ndarray
    dg2: np.ndarray
    dw1: np.ndarray
    dw2: np.ndarray
    dr: np.ndarray
    df: np.ndarray
    # bounds and coupled constraints
    lb: np.ndarray              # float [n]
    ub: np.ndarray              # float [n]
    c2_species: np.ndarray      # int [C2] species with a doubly constraint
    c2_rhs: np.ndarray          # float [C2] cnts_d / (1+eps)
    total_g: np.ndarray         # float [n] glength/rl
    total_rhs: float            # (1+eps) * num_reads
    max_cov: float


def build_problem(
    index_u: FlatIndex,
    index_d: Optional[FlatIndex],
    rcount_u: np.ndarray,
    rcount_d: np.ndarray,
    cnts_u: np.ndarray,
    cnts_d: np.ndarray,
    nus: np.ndarray,
    nds: np.ndarray,
    glength: np.ndarray,
    rl: int,
    num_reads: int,
    erate: float,
    fine: FineParams,
) -> QuantProblem:
    n = cnts_u.shape[0]
    exist0 = prefilter(cnts_u, cnts_d, nus, nds, fine)
    eps = fine.ilp_epsilon

    # map_sp sizes: unique entries under rid1; doubly under both rids
    size_u = np.zeros(n, np.int64)
    if index_u.num_entries:
        np.add.at(size_u, np.clip(index_u.rid1.astype(np.int64), 0, n - 1), 1)
    size_d = np.zeros(n, np.int64)
    if index_d is not None and index_d.num_entries:
        np.add.at(size_d, np.clip(index_d.rid1.astype(np.int64), 0, n - 1), 1)
        np.add.at(size_d, np.clip(index_d.rid2.astype(np.int64), 0, n - 1), 1)

    def wcov(uc, depth):
        return uc * (rl - depth) / rl * np.power(1.0 - erate, depth)

    # ---- unique terms (entries of existing species) ----
    if index_u.num_entries:
        g_all = index_u.rid1.astype(np.int64)
        w_all = wcov(index_u.ucount1.astype(np.float64),
                     index_u.length.astype(np.float64))
        keep = exist0[np.clip(g_all, 0, n - 1)]
        ug = g_all[keep]
        uw = w_all[keep]
        ur = rcount_u[keep].astype(np.float64)
        uf = 1000.0 / np.maximum(size_u[ug], 1)
    else:
        ug = np.zeros(0, np.int64)
        uw = ur = uf = np.zeros(0, np.float64)
        w_all = np.zeros(0, np.float64)
        g_all = np.zeros(0, np.int64)

    # ---- doubly terms: one per (existing owner, entry) ----
    downer = dg1 = dg2 = np.zeros(0, np.int64)
    dw1 = dw2 = dr = df = np.zeros(0, np.float64)
    if index_d is not None and index_d.num_entries:
        r1 = index_d.rid1.astype(np.int64)
        r2 = index_d.rid2.astype(np.int64)
        w1 = wcov(index_d.ucount1.astype(np.float64), index_d.length.astype(np.float64))
        w2 = wcov(index_d.ucount2.astype(np.float64), index_d.length.astype(np.float64))
        rr = rcount_d.astype(np.float64)
        blocks = []
        for owner_rid in (r1, r2):
            keep = exist0[np.clip(owner_rid, 0, n - 1)]
            blocks.append(
                (owner_rid[keep], r1[keep], r2[keep], w1[keep], w2[keep],
                 rr[keep], 1000.0 / np.maximum(size_d[owner_rid[keep]], 1))
            )
        downer = np.concatenate([b[0] for b in blocks])
        dg1 = np.concatenate([b[1] for b in blocks])
        dg2 = np.concatenate([b[2] for b in blocks])
        dw1 = np.concatenate([b[3] for b in blocks])
        dw2 = np.concatenate([b[4] for b in blocks])
        dr = np.concatenate([b[5] for b in blocks])
        df = np.concatenate([b[6] for b in blocks])

    # ---- bounds ----
    ub = np.where(exist0, fine.max_cov, 0.0)
    # unique coverage constraint collapses to a per-species lower bound
    sumw_u = np.zeros(n, np.float64)
    if index_u.num_entries:
        keep = exist0[np.clip(g_all, 0, n - 1)]
        np.add.at(sumw_u, g_all[keep], w_all[keep])
    constrained = exist0 & (nus >= fine.easy_to_identify_thres)
    with np.errstate(divide="ignore", invalid="ignore"):
        lb_c = np.where(
            constrained & (sumw_u > 0),
            cnts_u / ((1.0 + eps) * np.maximum(sumw_u, 1e-300)),
            0.0,
        )
    lb = np.minimum(lb_c, ub)

    c2_sp = np.nonzero(constrained)[0]
    c2_rhs = cnts_d[c2_sp].astype(np.float64) / (1.0 + eps)

    return QuantProblem(
        n=n, exist0=exist0,
        ug=ug, uw=uw, ur=ur, uf=uf,
        downer=downer, dg1=dg1, dg2=dg2, dw1=dw1, dw2=dw2, dr=dr, df=df,
        lb=lb, ub=ub,
        c2_species=c2_sp, c2_rhs=c2_rhs,
        total_g=np.asarray(glength, np.float64) / max(rl, 1),
        total_rhs=(1.0 + eps) * num_reads,
        max_cov=fine.max_cov,
    )


def solve_quant(prob: QuantProblem, iters: int = 2000, outer: int = 3,
                penalty: float = 1.0) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Solve the QP + rounding.  Returns (exist, cov, info)."""
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    n = prob.n
    if not prob.exist0.any():
        return np.zeros(n, bool), np.zeros(n), {"solve_time": 0.0, "objective": 0.0}

    ug = jnp.asarray(prob.ug, jnp.int32)
    uw = jnp.asarray(prob.uw)
    ur = jnp.asarray(prob.ur)
    uf = jnp.asarray(prob.uf)
    dg1 = jnp.asarray(prob.dg1, jnp.int32)
    dg2 = jnp.asarray(prob.dg2, jnp.int32)
    dw1 = jnp.asarray(prob.dw1)
    dw2 = jnp.asarray(prob.dw2)
    dr = jnp.asarray(prob.dr)
    df = jnp.asarray(prob.df)
    tg = jnp.asarray(prob.total_g)
    lb = jnp.asarray(prob.lb)
    ub = jnp.asarray(prob.ub)

    # doubly coverage rows: term t belongs to row sp_row[downer[t]]
    C2 = len(prob.c2_species)
    sp_row = np.full(prob.n, C2, np.int64)   # C2 = dropped row
    sp_row[prob.c2_species] = np.arange(C2)
    trow = jnp.asarray(sp_row[prob.downer] if len(prob.downer) else np.zeros(0, np.int64),
                       jnp.int32)
    c2_rhs = jnp.asarray(prob.c2_rhs)

    def objective(x):
        pu = uw * x[ug] - ur
        pd = dw1 * x[dg1] + dw2 * x[dg2] - dr
        return jnp.sum(uf * pu * pu) + jnp.sum(df * pd * pd)

    grad = jax.grad(objective)

    def e2_rows(x):
        vals = dw1 * x[dg1] + dw2 * x[dg2]
        return jnp.zeros(C2 + 1).at[trow].add(vals)[:C2]

    def al_grad(x, lam_tot, lam_c2, rho):
        g = grad(x)
        # total-coverage <= constraint
        viol = jnp.dot(tg, x) - prob.total_rhs
        mult = jnp.maximum(lam_tot + rho * viol, 0.0)
        g = g + mult * tg
        # doubly coverage >= constraints (C2 rows): rhs - E2 <= 0
        if C2 > 0 and len(prob.downer) > 0:
            e2 = e2_rows(x)
            rv = c2_rhs - e2
            mults = jnp.maximum(lam_c2 + rho * rv, 0.0)   # [C2]
            tm = mults[trow]                               # per-term multiplier
            g = g.at[dg1].add(-tm * dw1)
            g = g.at[dg2].add(-tm * dw2)
        return g

    # Lipschitz estimate via power iteration on the quadratic Hessian
    key = jax.random.PRNGKey(0)
    v0 = jax.random.uniform(key, (n,)) + 1e-3
    hvp = jax.jit(lambda v: jax.jvp(grad, (jnp.zeros(n),), (v,))[1])

    @jax.jit
    def power_iter(v):
        def body(_, v):
            hv = hvp(v)
            return hv / (jnp.linalg.norm(hv) + 1e-12)

        v = jax.lax.fori_loop(0, 10, body, v)
        return jnp.linalg.norm(hvp(v))

    L = float(power_iter(v0)) + 1e-6
    # scale the AL penalty by the constraint curvature so the smoothed
    # Hessian stays ~ (1+penalty) L and the 1/((1+penalty)L) step is stable
    nrm2 = float(np.dot(prob.total_g, prob.total_g))
    if C2 > 0 and len(prob.downer) > 0:
        row_sq = np.zeros(C2 + 1)
        rr = sp_row[prob.downer]
        a = np.zeros((C2 + 1, prob.n))
        np.add.at(a, (rr, prob.dg1), prob.dw1)
        np.add.at(a, (rr, prob.dg2), prob.dw2)
        nrm2 += float((a[:C2] ** 2).sum())
    rho = penalty * L / max(nrm2, 1e-12)
    step = 1.0 / (L * (1.0 + penalty))

    @jax.jit
    def run(x0, lam_tot, lam_c2):
        def body(i, carry):
            x, y, tprev = carry
            g = al_grad(y, lam_tot, lam_c2, rho)
            xn = jnp.clip(y - step * g, lb, ub)
            # gradient-based adaptive restart (O'Donoghue & Candes):
            # kill the momentum when it points against the descent step,
            # which prevents FISTA's rippling under box clipping
            restart = jnp.dot(g, xn - x) > 0
            tn = jnp.where(restart, 1.0,
                           0.5 * (1 + jnp.sqrt(1 + 4 * tprev * tprev)))
            yn = jnp.clip(xn + (tprev - 1) / tn * (xn - x), lb, ub)
            yn = jnp.where(restart, xn, yn)
            return xn, yn, tn

        x, _, _ = jax.lax.fori_loop(0, iters, body, (x0, x0, jnp.asarray(1.0)))
        viol = jnp.dot(tg, x) - prob.total_rhs
        lam_tot = jnp.maximum(lam_tot + rho * viol, 0.0)
        if C2 > 0 and len(prob.downer) > 0:
            lam_c2 = jnp.maximum(lam_c2 + rho * (c2_rhs - e2_rows(x)), 0.0)
        return x, lam_tot, lam_c2

    x = jnp.clip(jnp.zeros(n), lb, ub)
    lam_tot = jnp.asarray(0.0)
    lam_c2 = jnp.zeros(C2)
    for _ in range(outer):
        x, lam_tot, lam_c2 = run(x, lam_tot, lam_c2)

    x = np.asarray(x)
    # ---- rounding over the (0, 0.01) hole ----
    exist = prob.exist0 & ((x >= 0.005) | (prob.lb > 0))
    cov = np.where(exist, np.clip(x, 0.01, None), 0.0)
    cov = np.minimum(cov, prob.ub)
    import jax.numpy as jnp2

    obj = float(objective(jnp2.asarray(cov)))
    info = {
        "solve_time": time.perf_counter() - t0,
        "objective": obj,
        "lipschitz": L,
        "num_candidates": int(prob.exist0.sum()),
    }
    return exist, cov, info


def abundances(exist: np.ndarray, cov: np.ndarray) -> np.ndarray:
    total = cov[exist].sum()
    out = np.zeros_like(cov, dtype=np.float64)
    if total > 0:
        out[exist] = cov[exist] / total
    return out
