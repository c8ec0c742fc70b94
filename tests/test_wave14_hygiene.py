"""Unpersist hygiene (r18, VERDICT r17 item 7): nb_lang_classifier's
shared token table must not strand a CacheManager entry after the
query completes — library callers without bench.py's clearCache were
left holding a corpus-sized MEMORY_AND_DISK block."""


def _cache_manager_empty(spark) -> bool:
    return bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty()
    )


def test_nb_lang_no_stranded_cache(spark, sf_dir):
    from map_v2_etl_spark.plans.queries import REGISTRY
    from map_v2_etl_spark.plans.registry import all_queries

    all_queries()
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    df = REGISTRY.get("nb_lang_classifier").fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    # the query ran to completion; no InMemoryRelation may remain
    # registered — localCheckpoint blocks are reference-tracked by the
    # ContextCleaner instead
    assert _cache_manager_empty(spark)


def test_curation_and_pagerank_no_stranded_cache(spark, sf_dir):
    """Same audit for the other two in-query shared-parent persists
    VERDICT r17 named: curation_pipeline's token table (now a
    localCheckpoint) and doc_pagerank's pair table (unpersisted after
    pagerank's eager consumption)."""
    from map_v2_etl_spark.plans.queries import REGISTRY
    from map_v2_etl_spark.plans.registry import all_queries

    all_queries()
    for name in ("curation_pipeline", "doc_pagerank"):
        spark.catalog.clearCache()
        assert _cache_manager_empty(spark)
        df = REGISTRY.get(name).fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        assert _cache_manager_empty(spark), name


def test_nb_lang_rows_unchanged(spark, sf_dir):
    """The hygiene change must not alter the classifier output (the
    oracle pins values; this pins shape/row count in-suite)."""
    from map_v2_etl_spark.plans.queries import REGISTRY
    from map_v2_etl_spark.plans.registry import all_queries

    all_queries()
    df = REGISTRY.get("nb_lang_classifier").fn(spark, sf_dir)
    rows = df.collect()
    assert len(rows) == df.select("doc_id").distinct().count()
    assert set(df.columns) == {"doc_id", "pred_lang", "is_correct"}
