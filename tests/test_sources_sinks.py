"""Sources/sinks + extraction frontier + app tables."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F


def test_binary_scan_and_extract_pipeline(spark, tmp_path):
    from owl_etl_spark.sources.extract import (
        extract_text,
        read_binary_documents,
        structure_json,
    )

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "banco1_fondo1.pdf").write_bytes(b"%PDF-1.4 fake content one")
    (d / "banco2_fondo2.pdf").write_bytes(b"%PDF-1.4 other fake")
    (d / "ignored.txt").write_text("not a pdf")

    binary = read_binary_documents(spark, str(d))
    assert binary.count() == 2  # glob filter drops .txt (F5)

    texts = extract_text(binary)
    rows = {r.filename: r for r in texts.collect()}
    assert rows["banco1_fondo1.pdf"].extracted_text.startswith("FAKE_TEXT len=25")
    assert rows["banco1_fondo1.pdf"].extract_error is None

    docs = structure_json(texts)
    doc = {r.filename: r for r in docs.collect()}["banco1_fondo1.pdf"]
    assert doc.fic.politica_de_inversion.startswith("FAKE_TEXT")


def test_extract_retry_quarantine(spark, tmp_path):
    from owl_etl_spark.sources.extract import extract_text, read_binary_documents

    d = tmp_path / "pdfs"
    d.mkdir()
    (d / "bad.pdf").write_bytes(b"boom")

    def flaky(content: bytes) -> str:
        raise RuntimeError("service down")

    out = extract_text(read_binary_documents(spark, str(d)), extractor=flaky).collect()[0]
    assert out.extracted_text is None
    assert "service down" in out.extract_error


def test_staged_write_partitioning(spark, tmp_path):
    from owl_etl_spark.sources.writers import write_staged_parquet

    df = spark.createDataFrame(
        [("a", "2025", "7"), ("b", "2025", "8")], ["v", "anio", "mes"]
    )
    out = str(tmp_path / "staged")
    write_staged_parquet(df, out)
    assert os.path.isdir(f"{out}/anio=2025/mes=7")
    back = spark.read.parquet(out)
    # partition pruning: only one partition's files read
    pruned = back.filter((F.col("anio") == "2025") & (F.col("mes") == "7"))
    assert pruned.count() == 1


def test_skip_list_roundtrip(spark, tmp_path):
    from owl_etl_spark.sources.readers import read_skip_list
    from owl_etl_spark.sources.writers import write_skip_list

    df = spark.createDataFrame([("banco1_f1_raw.json",), ("banco2_f2_raw.json",)], ["stem"])
    path = str(tmp_path / "skiplist")
    write_skip_list(df, "stem", path)
    back = read_skip_list(spark, path)
    assert back.count() == 2
    assert all(r.skip_name.endswith("_transformed.json") for r in back.collect())


def test_app_tables_favorites(spark):
    from owl_etl_spark.operators.app_tables import (
        favorites_report,
        seed_recommendations,
        seed_users,
    )

    users = seed_users(spark, 3)
    fic = spark.createDataFrame(
        [(10, "fondoA", "Renta Fija", "http://a"), (20, "fondoB", "Mixta", "http://b"),
         (30, "fondoC", "Alternativa", "http://c")],
        ["fic_id", "nombre_fic", "tipo", "url"],
    )
    rec = seed_recommendations(users, fic, per_user=2)
    assert rec.count() == 6  # 3 users x first 2 fics
    rep = favorites_report(rec, fic)
    per_user = rep.groupBy("usuario_id").count().collect()
    assert all(r["count"] == 2 for r in per_user)
    assert {r.nombre_fic for r in rep.collect()} == {"fondoA", "fondoB"}


def test_write_sorted_parquet_clusters_keys(spark, tmp_path):
    """Range-partitioned sorted write: each output file covers a
    disjoint key range, so min/max stats can prune point lookups."""
    from owl_etl_spark.sources.writers import write_sorted_parquet

    df = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    ).repartition(8)  # scrambled input
    path = str(tmp_path / "sorted")
    write_sorted_parquet(df, path, ["k"], target_partitions=4)

    back = spark.read.parquet(path)
    assert back.count() == 10_000
    # per-file key ranges must be disjoint
    ranges = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .collect()
    )
    assert len(ranges) == 4
    spans = sorted((r.lo, r.hi) for r in ranges)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2, f"overlapping file ranges: ({lo1},{hi1}) vs ({lo2},{hi2})"


def test_compact_parquet_merges_small_files(spark, tmp_path):
    from owl_etl_spark.sources.writers import compact_parquet

    path = str(tmp_path / "splintered")
    spark.range(0, 1000).repartition(40).write.parquet(path)  # 40 tiny files
    before = spark.read.parquet(path)
    rows_before = sorted(r.id for r in before.collect())

    n = compact_parquet(spark, path, target_file_bytes=1 << 30)
    assert n == 1
    import os

    files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(files) == 1
    after = spark.read.parquet(path)
    assert sorted(r.id for r in after.collect()) == rows_before


def test_read_json_with_quarantine(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from owl_etl_spark.sources.readers import read_json_with_quarantine

    p = tmp_path / "in"
    p.mkdir()
    (p / "data.json").write_text(
        '{"id": 1, "name": "ok"}\n'
        '{"id": 2 "name": "missing comma"}\n'
        '{"id": 3, "name": "fine"}\n'
    )
    schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    good, bad = read_json_with_quarantine(spark, str(p), schema)
    assert sorted(r.id for r in good.collect()) == [1, 3]
    quarantined = bad.collect()
    assert len(quarantined) == 1 and "missing comma" in quarantined[0][0]


def test_read_parquet_merged_schema(spark, tmp_path):
    from owl_etl_spark.sources.readers import read_parquet_merged_schema

    v1 = str(tmp_path / "t" / "v=1")
    v2 = str(tmp_path / "t" / "v=2")
    spark.range(0, 3).select(F.col("id").alias("a")).write.parquet(v1)
    spark.range(3, 6).select(
        F.col("id").alias("a"), (F.col("id") * 10).alias("b")
    ).write.parquet(v2)
    df = read_parquet_merged_schema(spark, str(tmp_path / "t"))
    assert set(df.columns) >= {"a", "b"}
    rows = {r.a: r.b for r in df.collect()}
    assert rows[1] is None and rows[4] == 40
