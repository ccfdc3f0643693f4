"""Banded multi-probe cosine LSH (queries/simops.py embed_cosine_pairs_lsh).

A single 8-plane band misses any near pair differing in one sign bit; the
banded query unions N_BANDS independent plane sets so such pairs are
recovered.  Measured against the all-pairs baseline at sf0.001:

- every reported pair is exact (candidates are rescored with the exact dot
  product, so precision is 1.0 by construction);
- the single-band pair set is a subset of the banded set (band 0 is the
  round-3 signature);
- recall strictly improves with bands.
"""

SF = "/root/testdata/sf0.001"


def _pairs(df):
    pdf = df.toPandas()
    return set(zip(pdf.vec_a, pdf.vec_b))


def test_banded_lsh_recall_improves(spark, monkeypatch):
    from clin_variant_etl_spark.queries import simops

    base = _pairs(simops.embed_cosine_pairs(spark, SF))
    banded = _pairs(simops.embed_cosine_pairs_lsh(spark, SF))
    monkeypatch.setattr(simops, "N_BANDS", 1)
    single = _pairs(simops.embed_cosine_pairs_lsh(spark, SF))

    assert base, "baseline found no pairs — test data regression"
    # precision 1.0: every banded candidate is rescored exactly
    assert banded <= base
    # band 0 is the old single-band signature: banding only ADDs candidates
    assert single <= banded
    # the point of the feature: strictly more true pairs recovered
    assert len(banded & base) > len(single & base)
