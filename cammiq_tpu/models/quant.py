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
        # size_u[ug] >= 1 for every realized term (the owner genome owns
        # this very entry), so the max() guard never changes a value; the
        # reference's float division (1000.0/size, src/query.cpp:1155)
        # yields inf only for empty substring lists, which contribute no
        # terms in either implementation
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


def _make_host_bound(prob: QuantProblem):
    """Certified node lower bound for the B&B (host numpy).

    For any multipliers lam >= 0 (doubly-coverage rows, a >= constraint)
    and mu >= 0 (the TOTAL <= row), the Lagrangian
        L(z) = f(z) + lam . (c2_rhs - E2(z)) + mu . (tg.z - total_rhs)
    under-estimates f(z) at every node-feasible z, and by convexity
        L(z) >= L(x) + gL(x) . (z - x)   for all z,
    so  min_{z feasible} f(z) >= L(x) + min_{z in box} gL(x) . (z - x),
    where the box min is closed-form per coordinate.  The bound is VALID
    AT ANY x — an under-converged node solve only loosens it, it can
    never prune the true optimum (the r4 advisor finding: the previous
    prune compared against the FISTA objective value, which upper-bounds
    the relaxed optimum when unconverged).  mu is maximized over a
    log-grid (the bound is concave piecewise-linear in mu, every grid
    point is individually valid)."""
    n = prob.n
    C2 = len(prob.c2_species)
    sp_row = np.full(n, C2, np.int64)
    sp_row[prob.c2_species] = np.arange(C2)
    trow = sp_row[prob.downer] if len(prob.downer) else np.zeros(0, np.int64)
    live = trow < C2

    def bound(x, lam_c2, lbv, ubv):
        x = np.asarray(x, np.float64)
        pu = prob.uw * x[prob.ug] - prob.ur
        pd = prob.dw1 * x[prob.dg1] + prob.dw2 * x[prob.dg2] - prob.dr
        f = float(np.sum(prob.uf * pu * pu) + np.sum(prob.df * pd * pd))
        g = np.zeros(n)
        np.add.at(g, prob.ug, 2.0 * prob.uf * prob.uw * pu)
        np.add.at(g, prob.dg1, 2.0 * prob.df * prob.dw1 * pd)
        np.add.at(g, prob.dg2, 2.0 * prob.df * prob.dw2 * pd)
        const = f
        if C2 > 0 and live.any():
            lam = np.maximum(np.asarray(lam_c2, np.float64), 0.0)
            e2 = np.zeros(C2)
            vals = (prob.dw1 * x[prob.dg1] + prob.dw2 * x[prob.dg2])[live]
            np.add.at(e2, trow[live], vals)
            const += float(np.dot(lam, prob.c2_rhs - e2))
            tm = lam[trow[live]]
            np.add.at(g, prob.dg1[live], -tm * prob.dw1[live])
            np.add.at(g, prob.dg2[live], -tm * prob.dw2[live])
        tgx = float(np.dot(prob.total_g, x))
        mu0 = np.max(np.abs(g)) / (np.max(prob.total_g) + 1e-300)
        best = -np.inf
        for mu in [0.0] + [mu0 * 10.0 ** e for e in range(-6, 3)]:
            gm = g + mu * prob.total_g
            boxmin = np.sum(np.minimum(gm * (lbv - x), gm * (ubv - x)))
            best = max(best, const + mu * (tgx - prob.total_rhs) + boxmin)
        return best

    return bound


def solve_quant(prob: QuantProblem, iters: int = 2000, outer: int = 6,
                penalty: float = 1.0, tol: float = 1e-7,
                time_limit: float = 10800.0, enum_cap: int = 8,
                enum_iters: int = 400, bnb_cap: int = 64,
                bnb_nodes: int = 2048,
                verbose: bool = False) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Solve the reference MIQP (src/query.cpp:1082-1298) TPU-natively.

    Three stages, all on device:
    1. relaxed box-QP (the (0, 0.01) EXIST hole removed) by FISTA projected
       gradient + augmented Lagrangian for the coupled TOTAL / EXP2
       constraints; runs in convergence-checked chunks with a time limit
       (default matches the reference's 10800 s CPLEX TiLim,
       src/query.cpp:1260; CLI: --ilp_time_limit);
    2. branch over the EXIST booleans: candidates whose lower bound does
       not already force EXIST=1 are enumerated in vmapped batches of
       2**enum_cap subset QPs - the TPU-parallel replacement for CPLEX
       branch-and-bound.  With more than enum_cap free candidates the
       enumeration window is re-centered on the most ambiguous undecided
       candidates and repeated until the in/out decisions are stable and
       every candidate has been enumerated at least once (monotone
       block-coordinate descent over subsets: the incumbent assignment is
       one of the 2**m subsets of every window, so the best score never
       regresses).  Infeasible subsets are rejected by an exact-penalty
       score.  When enum_cap < n_free <= bnb_cap, an EXACT depth-first
       branch-and-bound then certifies/improves the window incumbent:
       each node's bound is the convex relaxation (the (0, 0.01) hole
       removed for undecided candidates only), nodes whose relaxed
       optimum lands outside every hole terminate integrally, and the
       tree completing within bnb_nodes proves optimality to solver
       tolerance (the CPLEX/Gurobi B&B role, src/query.cpp:1239-1260);
    3. a final polish solve at the winning bounds (top candidates of each
       round are polished to convergence before scoring).

    Returns (exist, cov, info).
    """
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

    def al_grad(x, lam_c2, rho):
        g = grad(x)
        # doubly coverage >= constraints (C2 rows): rhs - E2 <= 0, by
        # augmented Lagrangian (general coupled rows); the TOTAL <=
        # constraint is handled EXACTLY by projection (see project below)
        if C2 > 0 and len(prob.downer) > 0:
            e2 = e2_rows(x)
            rv = c2_rhs - e2
            mults = jnp.maximum(lam_c2 + rho * rv, 0.0)   # [C2]
            tm = mults[trow]                               # per-term multiplier
            g = g.at[dg1].add(-tm * dw1)
            g = g.at[dg2].add(-tm * dw2)
        return g

    def project(y, lbv, ubv):
        """Exact projection onto box [lb, ub] intersect {tg.x <= rhs}
        (continuous-knapsack dual bisection).  The single TOTAL row
        (src/query.cpp:1234-1237) handled this way converges far faster
        than a slow-multiplier AL on a near-binding constraint."""
        x = jnp.clip(y, lbv, ubv)
        viol = jnp.dot(tg, x) - prob.total_rhs

        def proj_mu(mu):
            return jnp.clip(y - mu * tg, lbv, ubv)

        # f(mu) = tg . proj_mu(mu) - rhs is monotone nonincreasing; at
        # mu_hi every tg>0 coordinate is at its lower bound
        hi = jnp.max(jnp.where(tg > 0, (y - lbv) / jnp.where(tg > 0, tg, 1.0), 0.0))
        hi = jnp.maximum(hi, 1.0)

        def body(i, ab):
            a, b = ab
            m = 0.5 * (a + b)
            f = jnp.dot(tg, proj_mu(m)) - prob.total_rhs
            return jnp.where(f > 0, m, a), jnp.where(f > 0, b, m)

        a, b = jax.lax.fori_loop(0, 60, body, (jnp.asarray(0.0), hi))
        return jnp.where(viol > 0, proj_mu(b), x)

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
    # scale the AL penalty by the C2 constraint curvature so the smoothed
    # Hessian stays ~ (1+penalty) L and the 1/((1+penalty)L) step is stable.
    # Row norms are accumulated sparsely over the term lists (the dense
    # [C2+1, n] matrix is O(20K x 20K) at production scale).
    has_c2 = C2 > 0 and len(prob.downer) > 0
    if has_c2:
        rr = sp_row[prob.downer]
        live = rr < C2
        keys = np.concatenate(
            [rr[live] * n + prob.dg1[live], rr[live] * n + prob.dg2[live]]
        )
        vals = np.concatenate([prob.dw1[live], prob.dw2[live]])
        uk, inv = np.unique(keys, return_inverse=True)
        acc = np.zeros(uk.shape[0])
        np.add.at(acc, inv, vals)
        nrm2 = float((acc ** 2).sum())
        rho = penalty * L / max(nrm2, 1e-12)
        step = 1.0 / (L * (1.0 + penalty))
    else:
        rho = 0.0
        step = 1.0 / L

    chunk_iters = max(iters // max(outer, 1), 50)

    def fista(x0, lam_c2, lbv, ubv, n_it):
        def body(i, carry):
            x, y, tprev = carry
            g = al_grad(y, lam_c2, rho)
            xn = project(y - step * g, lbv, ubv)
            # gradient-based adaptive restart (O'Donoghue & Candes):
            # kill the momentum when it points against the descent step,
            # which prevents FISTA's rippling under box clipping
            restart = jnp.dot(g, xn - x) > 0
            tn = jnp.where(restart, 1.0,
                           0.5 * (1 + jnp.sqrt(1 + 4 * tprev * tprev)))
            yn = project(xn + (tprev - 1) / tn * (xn - x), lbv, ubv)
            yn = jnp.where(restart, xn, yn)
            return xn, yn, tn

        x, _, _ = jax.lax.fori_loop(0, n_it, body, (x0, x0, jnp.asarray(1.0)))
        return x

    def lam_update(x, lam_c2):
        viol_c2 = (c2_rhs - e2_rows(x)) if has_c2 else jnp.zeros(C2)
        if has_c2:
            lam_c2 = jnp.maximum(lam_c2 + rho * viol_c2, 0.0)
        return lam_c2, viol_c2

    @jax.jit
    def run_chunk(x0, lam_c2, lbv, ubv):
        x = fista(x0, lam_c2, lbv, ubv, chunk_iters)
        lam_c2, viol_c2 = lam_update(x, lam_c2)
        dx = jnp.max(jnp.abs(x - x0))
        return x, lam_c2, viol_c2, dx

    def run_to_convergence(x, lam_c2, lbv, ubv, max_chunks):
        used = 0
        for _ in range(max_chunks):
            x, lam_c2, vc, dx = run_chunk(x, lam_c2, lbv, ubv)
            used += 1
            feas = True
            if has_c2:
                feas = bool(
                    (np.asarray(vc) <= tol * np.maximum(np.asarray(c2_rhs), 1.0)).all()
                )
            if float(dx) < tol * max(1.0, float(jnp.max(jnp.abs(x)))) and feas:
                break
            if time.perf_counter() - t0 > time_limit:
                break
        return x, lam_c2, used

    # ---- stage 1: relaxed solve ----
    x = jnp.clip(jnp.zeros(n), lb, ub)
    lam_c2 = jnp.zeros(C2)
    x, lam_c2, chunks_used = run_to_convergence(x, lam_c2, lb, ub, outer)
    xh = np.asarray(x)

    # ---- stage 2: branch over the (0, 0.01) EXIST hole ----
    # candidates forced by a positive lower bound (the EXP1 constraint,
    # src/query.cpp:1203-1206) are always selected; the rest are binary.
    forced = prob.exist0 & (prob.lb > 0)
    free = prob.exist0 & ~forced
    free_idx = np.nonzero(free)[0]
    n_free = len(free_idx)
    m = min(n_free, enum_cap)
    S = 1 << m
    masks = (np.arange(S)[:, None] >> np.arange(m)[None, :]) & 1  # [S, m]
    sel = masks.astype(bool)
    rows = np.repeat(np.arange(S), max(m, 1)).reshape(S, max(m, 1))

    def subset_bounds(enum_idx: np.ndarray, decisions: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """[S, n] bound arrays: forced genomes in, non-window free genomes
        fixed per `decisions`, window genomes swept over all 2**m subsets."""
        base_lb = np.where(forced, np.maximum(prob.lb, 0.01), 0.0)
        base_ub = np.where(forced, prob.ub, 0.0)
        fixed_sel = free_idx[decisions & ~np.isin(free_idx, enum_idx)]
        base_lb[fixed_sel] = 0.01
        base_ub[fixed_sel] = prob.ub[fixed_sel]
        lb_s = np.broadcast_to(base_lb, (S, n)).copy()
        ub_s = np.broadcast_to(base_ub, (S, n)).copy()
        if m:
            lb_s[rows[sel], np.broadcast_to(enum_idx, (S, m))[sel]] = 0.01
            ub_s[rows[sel], np.broadcast_to(enum_idx, (S, m))[sel]] = np.broadcast_to(
                prob.ub[enum_idx], (S, m)
            )[sel]
        return lb_s, ub_s

    def penalty_score(xs, knee):
        """objective + exact penalty on relative constraint violation
        beyond `knee` (the oracle counts <=1e-6 relative as feasible)."""
        obj = objective(xs)
        rv_tot = jnp.maximum(jnp.dot(tg, xs) - prob.total_rhs, 0.0) / max(
            prob.total_rhs, 1.0
        )
        pen = 1e12 * jnp.maximum(rv_tot - knee, 0.0)
        if has_c2:
            rv_c2 = jnp.maximum(c2_rhs - e2_rows(xs), 0.0) / jnp.maximum(
                c2_rhs, 1.0
            )
            pen = pen + 1e12 * jnp.sum(jnp.maximum(rv_c2 - knee, 0.0))
        return obj + pen

    @jax.jit
    def solve_subsets(lbv, ubv, x0, lc0):
        def one(lb_, ub_):
            xs = jnp.clip(x0, lb_, ub_)
            lc = lc0
            for _ in range(2):  # two AL rounds per subset
                xs = fista(xs, lc, lb_, ub_, max(enum_iters // 2, 1))
                lc, _ = lam_update(xs, lc)
            # LOOSE knee: coarse solves hover near active constraints, so
            # rank near-feasible subsets by objective; the exact knee is
            # applied after the per-candidate polish below
            return penalty_score(xs, 1e-3), xs

        return jax.vmap(one)(lbv, ubv)

    # iterated windowed enumeration: exact when n_free <= enum_cap (single
    # round sweeps every subset); otherwise block-coordinate subset descent
    # re-centered on the most ambiguous candidates until stable and every
    # candidate enumerated at least once
    decisions = xh[free_idx] >= 0.005 if n_free else np.zeros(0, bool)
    seen = np.zeros(n_free, bool)
    max_rounds = 1 if n_free <= enum_cap else 2 * -(-n_free // max(m, 1)) + 2
    if verbose and n_free > enum_cap:
        import sys

        print(
            f"[quant] {n_free} free candidates exceed enum_cap={enum_cap}; "
            f"iterating enumeration windows (<= {max_rounds} rounds)",
            file=sys.stderr,
        )

    best_x = x
    best_ub_full = np.where(forced, prob.ub, 0.0)
    rounds_used = 0
    stopped_by = "sweep" if n_free <= enum_cap else "round_budget"
    for _round in range(max_rounds):
        rounds_used += 1
        # window: undecided-yet-unseen candidates first, then most ambiguous
        amb = np.abs(xh[free_idx] - 0.005)
        win = np.lexsort((amb, seen))[:m]
        enum_idx = free_idx[win]
        lb_s, ub_s = subset_bounds(enum_idx, decisions)

        scores, xs_all = solve_subsets(
            jnp.asarray(lb_s), jnp.asarray(ub_s), x, lam_c2
        )
        scores = np.asarray(scores)

        # ---- stage 3: polish the top candidates to convergence, rescore
        # with the tight feasibility knee, keep the best ----
        top_k = min(S, 4)
        cand = np.argsort(scores)[:top_k]
        best_score = np.inf
        best = int(cand[0])
        for s in cand:
            lbj, ubj = jnp.asarray(lb_s[s]), jnp.asarray(ub_s[s])
            xb = jnp.clip(xs_all[int(s)], lbj, ubj)
            xb, _lc_f, _ = run_to_convergence(
                xb, lam_c2, lbj, ubj, max(outer // 2, 1)
            )
            sc = float(penalty_score(xb, 1e-6))
            if sc < best_score:
                best_score, best, best_x = sc, int(s), xb
        xh = np.asarray(best_x)
        best_ub_full = ub_s[best]

        new_dec = ((best >> np.arange(m)) & 1).astype(bool) if m else np.zeros(0, bool)
        changed = bool((decisions[win] != new_dec).any())
        decisions[win] = new_dec
        seen[win] = True
        if not changed and seen.all():
            if n_free > enum_cap:
                stopped_by = "stability"
            break
        if time.perf_counter() - t0 > time_limit:
            stopped_by = "time_limit"
            break

    # ---- stage 2b: exact B&B over the free EXIST booleans ----
    # Best-first over nodes ordered by a CERTIFIED lower bound (see
    # _make_host_bound): pruning is sound at any FISTA accuracy, so a
    # completed tree is an optimality certificate to solver tolerance
    # (the CPLEX/Gurobi B&B role, src/query.cpp:1239-1260).
    bnb_complete = False
    nodes = 0
    if enum_cap < n_free <= bnb_cap and stopped_by != "time_limit":
        import heapq

        host_bound = _make_host_bound(prob)
        incumbent = float(penalty_score(jnp.asarray(best_x), 1e-6))
        base_lb = np.where(forced, np.maximum(prob.lb, 0.01), 0.0)
        base_ub_f = np.where(forced, prob.ub, 0.0)
        # heap of (parent bound, tiebreak, status vector over free_idx:
        # -1 undecided, 0 out, 1 in, warm-start x)
        tie = 0
        heap = [(-np.inf, tie, np.full(n_free, -1, np.int8), xh)]
        bnb_complete = True
        while heap:
            pbound, _, st, xwarm = heapq.heappop(heap)
            margin = 1e-9 * (1.0 + abs(incumbent))
            if pbound >= incumbent - margin:
                continue  # certified: no completion of this node wins
            if nodes >= bnb_nodes or time.perf_counter() - t0 > time_limit:
                bnb_complete = False
                stopped_by = ("bnb_node_cap" if nodes >= bnb_nodes
                              else "time_limit")
                break
            nodes += 1
            lbv = base_lb.copy()
            ubv = base_ub_f.copy()
            inn = free_idx[st == 1]
            und = free_idx[st == -1]
            lbv[inn] = 0.01
            ubv[inn] = prob.ub[inn]
            ubv[und] = prob.ub[und]   # hole relaxed: lb stays 0
            lbj, ubj = jnp.asarray(lbv), jnp.asarray(ubv)
            xr, lam_r, _ = run_to_convergence(
                jnp.clip(jnp.asarray(xwarm), lbj, ubj), jnp.zeros(C2),
                lbj, ubj, max(outer // 2, 2))
            xrn = np.asarray(xr)
            cert = host_bound(xrn, np.asarray(lam_r), lbv, ubv)
            if cert >= incumbent - margin:
                continue
            sc = float(penalty_score(xr, 1e-6))
            uv = xrn[und]
            hole = (uv > 1e-9) & (uv < 0.01 - 1e-9)
            if not hole.any():
                # relaxed optimum is integral w.r.t. the EXIST holes: it
                # IS this node's exact optimum — candidate incumbent
                if sc < incumbent:
                    incumbent = sc
                    best_x = xr
                    best_ub_full = np.where(xrn >= 0.009, ubv, 0.0)
                continue
            ji = int(np.argmax(np.minimum(uv, 0.01 - uv) * hole))
            j = int(np.nonzero(free_idx == und[ji])[0][0])
            st_in = st.copy()
            st_in[j] = 1
            st_out = st.copy()
            st_out[j] = 0
            # children inherit the node's certified bound as priority;
            # the branch the relaxed value leans toward gets the earlier
            # tiebreak
            first, second = ((st_in, st_out) if uv[ji] >= 0.005
                             else (st_out, st_in))
            for child in (first, second):
                tie += 1
                heapq.heappush(heap, (cert, tie, child, xrn))
        if bnb_complete:
            stopped_by = "bnb"
        xh = np.asarray(best_x)
        if verbose:
            import sys

            print(f"[quant] B&B: {nodes} nodes, complete={bnb_complete}, "
                  f"incumbent={incumbent:.6g}", file=sys.stderr)

    exist = best_ub_full > 0
    cov = np.where(exist, np.clip(xh, 0.01, None), 0.0)
    cov = np.minimum(cov, prob.ub)

    obj = float(objective(jnp.asarray(cov)))
    info = {
        "solve_time": time.perf_counter() - t0,
        "objective": obj,
        "lipschitz": L,
        "num_candidates": int(prob.exist0.sum()),
        "free_candidates": n_free,
        "enum_size": S,
        "enum_rounds": rounds_used,
        "chunks_used": chunks_used,
        # exhaustive = every EXIST subset swept in one window, or the
        # exact B&B tree completed; otherwise the block-coordinate window
        # descent is monotone but heuristic
        "exhaustive": n_free <= enum_cap or bnb_complete,
        "stopped_by": stopped_by,
    }
    if not info["exhaustive"]:
        import warnings

        warnings.warn(
            f"quant: {n_free} free EXIST candidates exceed enum_cap="
            f"{enum_cap} and the exact B&B did not complete (stopped by "
            f"{stopped_by}); the selection is locally optimal but not "
            f"proven exact (raise --ilp_enum_cap or bnb_nodes)")
    if verbose:
        # solver log, the --enable_ilp_display analog
        # (reference: cplex.setOut unless debug, src/query.cpp:1262-1263)
        import sys

        print(
            f"[quant] candidates={info['num_candidates']} forced="
            f"{int(forced.sum())} free={n_free} enum_subsets={S}x"
            f"{rounds_used} relax_chunks={chunks_used}x{chunk_iters} "
            f"L={L:.4g} C2_rows={C2}",
            file=sys.stderr,
        )
        print(
            f"[quant] winner objective={obj:.6g} "
            f"selected={np.nonzero(exist)[0].tolist()} "
            f"time={info['solve_time']*1e3:.0f} ms",
            file=sys.stderr,
        )
    return exist, cov, info


def abundances(exist: np.ndarray, cov: np.ndarray) -> np.ndarray:
    total = cov[exist].sum()
    out = np.zeros_like(cov, dtype=np.float64)
    if total > 0:
        out[exist] = cov[exist] / total
    return out
