"""Smoke: every registered query runs at sf0.001 and the driver contract
holds (queries/oracle_sql key discipline, entry > 0 rows)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from pigout_spark import queries as qmod

#: driver-facing set + locally-verified extras (folded/subsumed queries)
ALL_QUERIES = {**entrymod.queries(), **qmod.extra_queries()}


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_oracle_keys_subset_of_queries():
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 20
    # the driver records only the first 50 queries (round-1 lesson) —
    # never hand it more than that window
    assert len(q) <= qmod.DRIVER_QUERY_CAP
    assert not set(qmod.extra_queries()) & set(q)


@pytest.mark.parametrize("name", sorted(ALL_QUERIES))
def test_query_runs(spark, sf_dir, name):
    df = ALL_QUERIES[name](spark, sf_dir)
    # count() forces full execution; schema must be stable
    assert df.count() >= 0
    assert len(df.columns) > 0


#: the full registry size, pinned (r9 verdict #5: SURVEY prose said 208
#: when the import said 207 — docs must not drift from code again).
#: Update this constant WITH the SURVEY §7.4 number when adding queries.
REGISTRY_TOTAL_PINNED = 258  # r14: 249 mid-round + the 5 late
# additions (x_mann_kendall, x_chao1, x_fs_linkage, x_png_meta,
# x_jw_pairs) + x_winnow + x_img_dhash + x_cox_ph + x_logrank_strat
# metadata (x_wav_meta — deterministic PCM payloads round-tripped
# through the dependency-free RIFF codec, r13 verdict #8) + AVI/RIFF
# video-container metadata (x_avi_meta — the video analog, closing the
# audio/video multimodal hole) + Flesch/Flesch-Kincaid readability
# (x_readability — exact regex counts, ROUND-6 IEEE chains) + A/B
# experiment sizing (x_power_mde — MDE + required per-arm n from the
# welch moment fold and the public 6-dp z-table).
# r13 history: 239 at r12 close + per-doc token
# entropy (x_token_entropy) + the Good-Turing smoothing table
# (x_good_turing) + the Zipf exponent fit (x_zipf_fit) + hybrid
# Reciprocal Rank Fusion (x_rrf_fusion) + the always-valid sequential
# mSPRT (x_msprt) + blocked-Levenshtein fuzzy near-dup pairs
# (x_fuzzy_pairs).
# r12 history: 223 at r11 close + the sampled
# triangle estimate (x_triangles_sampled) + the pinned-axes PCA
# projection (x_pca_project) + the one-pass Poisson bootstrap
# (x_boot_ci) + temperature mixing weights (x_temp_mixture) + the
# logistic quality scorer (x_quality_logit) + the observational-causal
# family (x_did, x_psm) + robust/conformal stats (x_trimmed_mean,
# x_conformal) + the ratio-metric jackknife (x_jackknife) + the
# Neyman-optimal stratified allocation (x_neyman) + asymmetric
# containment near-dup (x_containment) + the empirical-Bernstein
# bounded-mean CI (x_eb_ci) + the Cochran-Armitage trend test
# (x_cochran) + Benjamini-Yekutieli FDR (x_by_fdr) + the streaming
# CUSUM batch-replay attestation (x_cusum_replay).
# r11 history: 212 at r10 close + the two streaming
# batch-replay attestations (x_funnel_replay, x_transitions_replay) +
# the parametric mean tests (x_anova_f, x_welch_ttest) + the proportion
# z and robust-slope tests (x_two_prop_z, x_theil_sen) + the embedding
# covariance/PCA family (x_emb_covariance) + the ANN recall evaluation
# (x_ann_recall), the Nelson-Aalen cumulative hazard (x_nelson_aalen),
# the Mantel-Haenszel pooled odds ratio (x_mantel_haenszel), and the
# Benford first-digit screen (x_benford)


def test_registry_size_pinned():
    total = len(qmod.REGISTRY) + len(qmod.EXTRA_REGISTRY)
    assert total == REGISTRY_TOTAL_PINNED, (
        f"registry has {total} queries but REGISTRY_TOTAL_PINNED says "
        f"{REGISTRY_TOTAL_PINNED} — update the constant AND SURVEY §7.4"
    )


def test_r14_window_landed():
    """The r14 explicit window (queries/__init__.py): the driver-facing
    set is exactly _WINDOW_R14 in order, every entry has a SQL oracle,
    and everything displaced kept its local oracle as an extra."""
    from pigout_spark.queries import _WINDOW_R14

    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert list(q) == _WINDOW_R14
    assert len(q) == qmod.DRIVER_QUERY_CAP
    for name in q:
        assert name in o, f"{name} in window without a SQL oracle"
    extras = qmod.extra_oracle_sql()
    # spot-check displaced rows kept their oracle (rows-only pair has
    # no SQL by design — it lives in extra_queries, not the oracle map)
    # — incl. r13 settled anchors that ceded slots to the r14 stale
    # re-anchors (every one holds a fresh r13 driver row)
    for name in ("x_semantic_pairs", "x_twa", "x_attribution_last",
                 "x_grouped_kruskal", "x_funnel_replay",
                 "x_kmv_estimate", "q10_rank", "stream_sliding",
                 "x_triangles", "q02_filter_project", "q03_join_agg",
                 "dedup_minhash", "text_quality", "x_sessionize",
                 "x_boot_ci", "x_containment"):
        assert name not in q and name in extras
    assert "x_sample_bernoulli" in qmod.extra_queries()
    assert "x_sample_bernoulli" not in extras


def test_coverage_doc_names_registry():
    """COVERAGE.md (the §2→module map the judge reads) must name every
    registered query — r10 verdict #5: the map had zero r10 rows while
    the registry grew; this pin makes that drift impossible."""
    from pathlib import Path

    cov = (Path(__file__).resolve().parent.parent / "COVERAGE.md").read_text()
    names = set(qmod.REGISTRY) | set(qmod.EXTRA_REGISTRY)
    missing = sorted(n for n in names if n not in cov)
    assert not missing, (
        f"{len(missing)} registered queries absent from COVERAGE.md: "
        f"{missing} — add a row (or mention) for each"
    )


def test_coverage_doc_refs_resolve():
    """Every `file.py:symbol` reference in COVERAGE.md must point at an
    existing module that still defines that symbol — r11 verdict #8:
    the name-presence pin above stops registry drift, this stops the
    FILE references from rotting when code moves or renames."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parent.parent
    cov = (root / "COVERAGE.md").read_text()
    pkg = root / "pigout_spark"
    # index every .py under the package and tests by basename and by
    # package-relative suffix, so both `behavioral.py:fn` and
    # `pipeline/graph.py:fn` resolve
    candidates: dict[str, list[Path]] = {}
    for p in list(pkg.rglob("*.py")) + list((root / "tests").rglob("*.py")):
        rel = p.relative_to(root).as_posix()
        for key in {p.name, rel, rel.split("/", 1)[-1]}:
            candidates.setdefault(key, []).append(p)
    bad = []
    for m in re.finditer(r"([A-Za-z_][\w/]*\.py):([A-Za-z_]\w*)", cov):
        path_ref, sym = m.group(1), m.group(2)
        paths = candidates.get(path_ref) or candidates.get(
            path_ref.split("/")[-1]
        )
        if not paths:
            bad.append(f"{path_ref}:{sym} — no such module")
            continue
        pat = re.compile(rf"\b{re.escape(sym)}\b")
        if not any(pat.search(p.read_text()) for p in paths):
            bad.append(f"{path_ref}:{sym} — symbol not found in module")
    assert not bad, (
        f"{len(bad)} stale file:symbol references in COVERAGE.md:\n  "
        + "\n  ".join(bad)
    )
