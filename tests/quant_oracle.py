"""Brute-force MIQP oracle for the quantification model.

Independent transcription of the reference's CPLEX program
(src/query.cpp:1082-1298): enumerate every EXIST assignment over the
pre-filter survivors, solve the continuous QP of each assignment with
scipy (SLSQP), and return the feasible assignment with the smallest
objective.  Used only as a test oracle for models/quant.py.
"""

from __future__ import annotations

import itertools

import numpy as np
from scipy.optimize import minimize


def oracle_prefilter(cnts_u, cnts_d, nus, nds, fine):
    """Transcription of src/query.cpp:1100-1133 (1-based species slots)."""
    n = len(cnts_u)
    exist = np.ones(n, bool)
    exist[0] = False
    for g in range(1, n):
        d1 = cnts_u[g] - fine.read_cnt_thres
        d2 = cnts_u[g] - nus[g] * fine.ilp_alpha
        if nus[g] >= fine.easy_to_identify_thres:
            if d1 < 0 or d2 < 0:
                exist[g] = False
        else:
            if d2 < 0:
                exist[g] = False
        d1 = cnts_d[g] - fine.read_cnt_thres
        d2 = cnts_d[g] - nds[g] * fine.ilp_alpha
        if nus[g] >= fine.easy_to_identify_thres:  # reference uses nus here
            if d1 < 0 or d2 < 0:
                exist[g] = False
        else:
            if d2 < 0:
                exist[g] = False
    return exist


def oracle_miqp(index_u, index_d, rcount_u, rcount_d, cnts_u, cnts_d,
                nus, nds, glength, rl, num_reads, erate, fine,
                feas_tol=1e-6):
    """Returns (exist[n] bool, cov[n], objective) of the global optimum,
    or (zeros, zeros, inf) if every assignment is infeasible."""
    n = len(cnts_u)
    exist0 = oracle_prefilter(cnts_u, cnts_d, nus, nds, fine)
    surv = np.nonzero(exist0)[0]
    eps = fine.ilp_epsilon

    def wcov(uc, depth):
        return uc * (rl - depth) / rl * (1.0 - erate) ** depth

    # term lists of survivors (map_sp semantics: unique entries under rid1;
    # doubly entries under both member genomes)
    u_terms = []          # (g_owner, w, rcount, factor)
    d_terms = []          # (g_owner, g1, g2, w1, w2, rcount, factor)
    size_u = np.zeros(n, np.int64)
    size_d = np.zeros(n, np.int64)
    for e in range(index_u.num_entries):
        size_u[index_u.rid1[e]] += 1
    if index_d is not None:
        for e in range(index_d.num_entries):
            size_d[index_d.rid1[e]] += 1
            size_d[index_d.rid2[e]] += 1
    for e in range(index_u.num_entries):
        g = int(index_u.rid1[e])
        if not exist0[g]:
            continue
        w = wcov(index_u.ucount1[e], index_u.length[e])
        u_terms.append((g, w, float(rcount_u[e]), 1000.0 / size_u[g]))
    if index_d is not None:
        for e in range(index_d.num_entries):
            g1, g2 = int(index_d.rid1[e]), int(index_d.rid2[e])
            w1 = wcov(index_d.ucount1[e], index_d.length[e])
            w2 = wcov(index_d.ucount2[e], index_d.length[e])
            for owner in (g1, g2):
                if not exist0[owner]:
                    continue
                d_terms.append((owner, g1, g2, w1, w2, float(rcount_d[e]),
                                1000.0 / size_d[owner]))

    def objective(c):
        obj = 0.0
        for g, w, r, f in u_terms:
            obj += f * (w * c[g] - r) ** 2
        for _, g1, g2, w1, w2, r, f in d_terms:
            obj += f * (w1 * c[g1] + w2 * c[g2] - r) ** 2
        return obj

    def grad(c):
        g_ = np.zeros(n)
        for g, w, r, f in u_terms:
            g_[g] += 2 * f * w * (w * c[g] - r)
        for _, g1, g2, w1, w2, r, f in d_terms:
            p = w1 * c[g1] + w2 * c[g2] - r
            g_[g1] += 2 * f * w1 * p
            g_[g2] += 2 * f * w2 * p
        return g_

    # constraint rows over the FULL cov vector (survivors' EXP1/EXP2 rows
    # apply whether or not the genome is in the subset; a dropped genome
    # contributes COV=0): a_row . c >= rhs_row
    ge_rows = []
    for g in surv:
        if nus[g] >= fine.easy_to_identify_thres:
            a1 = np.zeros(n)
            for go, w, r, f in u_terms:
                if go == g:
                    a1[g] += w
            ge_rows.append((a1 * (1.0 + eps), float(cnts_u[g])))
            a2 = np.zeros(n)
            for go, g1, g2, w1, w2, r, f in d_terms:
                if go == g:
                    a2[g1] += w1
                    a2[g2] += w2
            ge_rows.append((a2 * (1.0 + eps), float(cnts_d[g])))
    tot_a = np.asarray(glength, np.float64) / rl
    tot_rhs = (1.0 + eps) * num_reads

    best = (np.zeros(n, bool), np.zeros(n), np.inf)
    for subset in itertools.chain.from_iterable(
        itertools.combinations(surv, k) for k in range(len(surv) + 1)
    ):
        sel = np.zeros(n, bool)
        sel[list(subset)] = True
        # quick infeasibility: a >= row whose support is entirely outside
        # the subset but rhs > 0 can never be met
        bad = False
        for a, rhs in ge_rows:
            if rhs > feas_tol and not (np.abs(a[sel]) > 0).any():
                bad = True
                break
        if bad:
            continue
        idx = np.nonzero(sel)[0]
        k = len(idx)

        def full(z):
            c = np.zeros(n)
            c[idx] = z
            return c

        cons = []
        for a, rhs in ge_rows:
            cons.append({
                "type": "ineq",
                "fun": (lambda z, a=a, rhs=rhs: np.dot(a[idx], z) - rhs),
                "jac": (lambda z, a=a: a[idx]),
            })
        cons.append({
            "type": "ineq",
            "fun": (lambda z: tot_rhs - np.dot(tot_a[idx], z)),
            "jac": (lambda z: -tot_a[idx]),
        })
        if k == 0:
            c = np.zeros(n)
            feas = all(np.dot(a, c) >= rhs - feas_tol for a, rhs in ge_rows)
            if feas:
                obj = objective(c)
                if obj < best[2] - 1e-12:
                    best = (sel, c, obj)
            continue
        z0 = np.full(k, 1.0)
        res = minimize(
            lambda z: objective(full(z)),
            z0,
            jac=lambda z: grad(full(z))[idx],
            bounds=[(0.01, fine.max_cov)] * k,
            constraints=cons,
            method="SLSQP",
            options={"maxiter": 300, "ftol": 1e-12},
        )
        c = full(res.x)
        scale = max(1.0, abs(tot_rhs))
        feas = (np.dot(tot_a, c) <= tot_rhs + feas_tol * scale) and all(
            np.dot(a, c) >= rhs - feas_tol * max(1.0, abs(rhs))
            for a, rhs in ge_rows
        )
        if not feas:
            continue
        obj = objective(c)
        if obj < best[2] - 1e-12:
            best = (sel, c, obj)
    return best
