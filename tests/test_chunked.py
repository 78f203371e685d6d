"""Chunk-carried streaming sweeps (index/chunked.py) must reproduce the
monolithic engines (index/unique.py) exactly over random (gsa, lcp) and
arbitrary chunkings — LCP0 unique/doubly, GSA2, MU targets, OCC/OCC2."""

import os
import tempfile

import numpy as np
import pytest

from cammiq_tpu.index import chunked as ck
from cammiq_tpu.index.unique import (doubly_lcp0, min_unique, occ_doubly,
                                     occ_unique, run_info, unique_lcp0)


@pytest.mark.parametrize("seed", range(6))
def test_chunked_matches_monolithic(seed):
    rng = np.random.default_rng(seed)
    n, ngen, nchunks, el, ulmax = 5000, 6, 7, 4, 30
    gsa = rng.integers(1, ngen + 1, n).astype(np.int64)
    gsa = np.repeat(gsa, rng.integers(1, 5, n))[:n]
    lcp = rng.integers(0, 40, n + 1).astype(np.int64)
    lcp[0] = lcp[n] = 0
    sa = rng.permutation(n).astype(np.int64)

    ref_u = unique_lcp0(gsa, lcp, el)
    dres = doubly_lcp0(sa, gsa, lcp, el, ulmax)
    g2_rank_ref = dres.gsa2[sa]

    with tempfile.TemporaryDirectory() as wd:
        cuts = np.sort(rng.choice(np.arange(1, n), nchunks - 1,
                                  replace=False))
        cuts = np.concatenate([[0], cuts, [n]])
        for c in range(nchunks):
            s, e = cuts[c], cuts[c + 1]
            np.save(os.path.join(wd, f"ch{c:04d}_gid.npy"), gsa[s:e])
            np.save(os.path.join(wd, f"ch{c:04d}_lcp.npy"), lcp[s:e])
            np.save(os.path.join(wd, f"ch{c:04d}_pos.npy"), sa[s:e])
        nruns = ck.forward_pass(wd, nchunks)
        assert nruns == run_info(gsa).nruns
        ck.backward_pass(wd, nchunks, nruns, el, ulmax, "both")

        def cat(name):
            return np.concatenate([
                np.load(os.path.join(wd, f"ch{c:04d}_{name}.npy"))
                for c in range(nchunks)])

        np.testing.assert_array_equal(cat("lcp0u"), ref_u)
        np.testing.assert_array_equal(cat("lcp0d"), dres.lcp0)
        np.testing.assert_array_equal(
            np.where(cat("g2w"), cat("g2r"), 0), g2_rank_ref)

        text_cuts = np.array([0, n // 2, n], np.int64)
        ends = np.nonzero(np.concatenate([gsa[1:] != gsa[:-1], [True]]))[0]
        ck.occ_emit_pass(wd, nchunks, n, ulmax, "both", text_cuts,
                         int(ends[0]))

        occ_u_ref = occ_unique(sa, gsa, lcp, ref_u)
        occ_d_ref, occ2_ref = occ_doubly(sa, gsa, dres.gsa2, lcp,
                                         dres.lcp0, ulmax)
        mu_u = np.full(n + 1, 0xFFFF, np.int64)
        occ_u_got = np.zeros(n, np.int64)
        mu_d = np.full(n + 1, 0xFFFF, np.int64)
        occ_d_got = np.zeros(n, np.int64)
        occ2_got = np.zeros(n, np.int64)
        g2_got = np.zeros(n, np.int64)
        for c in range(nchunks):
            for s in range(2):
                r = np.load(os.path.join(wd, f"ut_{c:04d}_{s:03d}.npy"))
                if r.size:
                    np.minimum.at(mu_u, r[:, 0] + r[:, 1] + 1, r[:, 1])
                    occ_u_got[r[:, 0]] = r[:, 2]
                r = np.load(os.path.join(wd, f"dt_{c:04d}_{s:03d}.npy"))
                if r.size:
                    np.minimum.at(mu_d, r[:, 0] + r[:, 1] + 1, r[:, 1])
                    occ_d_got[r[:, 0]] = r[:, 2]
                    occ2_got[r[:, 0]] = r[:, 3]
                    g2_got[r[:, 0]] = r[:, 4]
        np.testing.assert_array_equal(mu_u, min_unique(sa, ref_u, n))
        np.testing.assert_array_equal(
            mu_d, min_unique(sa, dres.lcp0, n, ulmax=ulmax))
        cand_u = sa[(sa + ref_u + 1) <= n]
        np.testing.assert_array_equal(occ_u_got[cand_u], occ_u_ref[cand_u])
        keep = (dres.lcp0 < ulmax) & ((sa + dres.lcp0 + 1) <= n)
        cd = sa[keep]
        np.testing.assert_array_equal(occ_d_got[cd], occ_d_ref[cd])
        np.testing.assert_array_equal(occ2_got[cd], occ2_ref[cd])
        np.testing.assert_array_equal(g2_got[cd], dres.gsa2[cd])
