"""Extraction frontier (SURVEY.md §2.1 S1-S3): binary document scan +
pluggable text extraction + pluggable LLM structuring.

The reference's extract stage is two external services — a PDF-to-text
API polled per file and an LLM that structures text into JSON
(reference: src/etl/extract.py:111-202), fanned out over a thread
pool. The Spark shape:

- S1: ``spark.read.format("binaryFile")`` scan (one row per PDF:
  path, modificationTime, length, content);
- S2/S3: ``mapInPandas`` stages with a pluggable extractor/structurer
  so tests run hermetically (deterministic fakes) and production swaps
  in real clients without touching the plan. Retries/backoff live
  INSIDE the UDF (Spark task retries handle machine faults; the
  backoff handles service rate limits — same split as the reference).

Rate-limited external services at scale: bound in-flight calls by
partition count (``df.repartition(max_concurrency)``) — one partition
is one serial client loop; do NOT thread inside the UDF.
"""

from __future__ import annotations

import json
import re
import zlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TextExtractor = Callable[[bytes], str]
JsonStructurer = Callable[[str], str]


def read_binary_documents(spark: SparkSession, path: str, glob: str = "*.pdf") -> DataFrame:
    """S1: binary folder scan with glob + F5 path validation for free
    (non-matching and non-file paths never enter the DataFrame)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
        .select(
            F.col("path"),
            F.element_at(F.split("path", "/"), -1).alias("filename"),
            F.col("length").alias("n_bytes"),
            F.col("content"),
        )
    )


def fake_text_extractor(content: bytes) -> str:
    """Hermetic S2 stand-in: deterministic pseudo-text derived from the
    payload (real deployments plug pdfplumber/PyPDF2 or an external
    OCR service here; those libs are not in this environment)."""
    return f"FAKE_TEXT len={len(content)} head={content[:16].hex()}"


def _pdf_literal_string(data: bytes, i: int) -> tuple[bytes, int]:
    """Parse a PDF literal string starting at the '(' at ``data[i]``;
    returns (decoded bytes, index past the closing ')'). Handles
    nested parens, the \\-escapes of ISO 32000 §7.3.4.2 (named, octal,
    line-continuation)."""
    assert data[i : i + 1] == b"("
    out = bytearray()
    depth, i = 1, i + 1
    esc = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
           b"(": b"(", b")": b")", b"\\": b"\\"}
    while i < len(data) and depth:
        c = data[i : i + 1]
        if c == b"\\":
            nxt = data[i + 1 : i + 2]
            if nxt in esc:
                out += esc[nxt]
                i += 2
            elif nxt.isdigit():
                j = i + 1
                while j < min(i + 4, len(data)) and data[j : j + 1].isdigit():
                    j += 1
                out.append(int(data[i + 1 : j], 8) & 0xFF)
                i = j
            elif nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and data[i : i + 1] == b"\n":
                    i += 1
            else:
                i += 1
        elif c == b"(":
            depth += 1
            out += c
            i += 1
        elif c == b")":
            depth -= 1
            if depth:
                out += c
            i += 1
        else:
            out += c
            i += 1
    return bytes(out), i


def _pdf_content_text(stream: bytes) -> list[str]:
    """Scan one decoded content stream for text-show operators.

    Supports Tj / TJ / ' / \" shows, newlines on Td/TD/T*/ET, literal
    ``(...)`` and hex ``<...>`` strings. Glyph bytes are decoded as
    cp1252 (WinAnsi — the common single-byte encoding); CMap/Type0
    composite fonts are out of scope and simply yield their raw bytes.
    """
    lines: list[str] = [""]
    pending: list[bytes] = []  # string operands since the last operator
    i, n = 0, len(stream)
    token = bytearray()

    def flush_token() -> None:
        nonlocal token
        op = bytes(token)
        token = bytearray()
        if op in (b"Tj", b"'", b'"'):
            if op in (b"'", b'"') and lines[-1]:  # ' and " move to the next line first
                lines.append("")
            if pending:
                lines[-1] += pending[-1].decode("cp1252", errors="replace")
            del pending[:]
        elif op == b"TJ":
            lines[-1] += b"".join(pending).decode("cp1252", errors="replace")
            del pending[:]
        elif op in (b"Td", b"TD", b"T*", b"ET"):
            if lines[-1]:
                lines.append("")
            del pending[:]

    while i < n:
        c = stream[i : i + 1]
        if c == b"(":
            s, i = _pdf_literal_string(stream, i)
            pending.append(s)
        elif c == b"<" and stream[i + 1 : i + 2] != b"<":
            j = stream.find(b">", i)
            j = j if j != -1 else n
            hexs = re.sub(rb"\s", b"", stream[i + 1 : j])
            if len(hexs) % 2:
                hexs += b"0"
            try:
                pending.append(bytes.fromhex(hexs.decode("ascii")))
            except ValueError:
                pass
            i = j + 1
        elif c.isspace() or c in (b"[", b"]", b"/"):
            flush_token()
            i += 1
        else:
            token += c
            i += 1
    flush_token()
    return [ln for ln in lines if ln]


def pdf_text_extractor(content: bytes) -> str:
    """REAL S2 extractor for digitally-born PDFs — pure stdlib (zlib +
    a content-stream scanner), so it is hermetic in this environment.

    The reference extracts text through an external PDF API
    (src/etl/extract.py:111-166) with an offline pdfplumber path in
    notebooks/pdfPlumber.ipynb; this is the equivalent offline path.
    Scope: unencrypted PDFs whose page content streams are plain or
    FlateDecode, with simple (single-byte) fonts — i.e. machine-
    generated fact sheets. Scanned/encrypted/Type0-CMap PDFs raise
    ``ValueError`` (→ retry/quarantine in ``extract_text``, exactly
    like an API failure).
    """
    if not content.startswith(b"%PDF"):
        raise ValueError("not a PDF (missing %PDF header)")
    if b"/Encrypt" in content:
        raise ValueError("encrypted PDF not supported")
    lines: list[str] = []
    for m in re.finditer(rb"<<(.*?)>>\s*stream\r?\n", content, re.S):
        meta = m.group(1)
        start = m.end()
        end = content.find(b"endstream", start)
        if end == -1:
            continue
        raw = content[start:end].rstrip(b"\r\n")
        if b"/FlateDecode" in meta:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                continue
        elif b"/Filter" in meta:
            continue  # unsupported filter (DCT images etc.)
        if b"BT" in raw:
            lines.extend(_pdf_content_text(raw))
    if not lines:
        raise ValueError("no extractable text (scanned or unsupported PDF)")
    return "\n".join(lines)


def fake_json_structurer(text: str) -> str:
    """Hermetic S3 stand-in: wraps the text into the FIC document shape
    the way the LLM prompt enforces it (fence-stripping included in the
    real client; the fake emits clean JSON directly)."""
    return json.dumps({"fic": {"nombre_fic": text[:24], "gestor": None, "custodio": None,
                               "fecha_corte": None, "politica_de_inversion": text}})


def extract_text(
    df: DataFrame,
    extractor: TextExtractor = fake_text_extractor,
    max_retries: int = 3,
) -> DataFrame:
    """S2: content → extracted_text via Arrow-batched mapInPandas.

    Exponential backoff on extractor exceptions, per the reference's
    retry policy (2^n backoff, 3 retries — src/etl/extract.py:122-164);
    a row that exhausts retries gets null text + the error message in
    ``extract_error`` instead of failing the task (bad records must not
    kill a 100 TB job — quarantine downstream).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import time

        for pdf in batches:
            texts, errors = [], []
            for content in pdf["content"]:
                err, text = None, None
                for attempt in range(max_retries):
                    try:
                        text = extractor(bytes(content))
                        err = None
                        break
                    except Exception as e:  # noqa: BLE001 — quarantine, don't kill the job
                        err = str(e)
                        time.sleep(min(2**attempt * 0.01, 1.0))
                texts.append(text)
                errors.append(err)
            yield pd.DataFrame(
                {
                    "path": pdf["path"],
                    "filename": pdf["filename"],
                    "extracted_text": texts,
                    "extract_error": errors,
                }
            )

    return df.mapInPandas(
        fn, schema="path string, filename string, extracted_text string, extract_error string"
    )


def structure_json(
    df: DataFrame,
    structurer: JsonStructurer = fake_json_structurer,
    schema=None,
) -> DataFrame:
    """S3: extracted_text → parsed document struct. The structurer
    returns a JSON string (LLM output with fences stripped); parsing
    into the typed schema happens JVM-side via ``from_json``."""
    from owl_etl_spark.schemas import FIC_RAW_SCHEMA

    schema = schema or FIC_RAW_SCHEMA

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for t in pdf["extracted_text"]:
                if t is None:
                    out.append(None)
                    continue
                raw = structurer(t)
                # strip ```json fences the way the reference does
                # (src/etl/extract.py:192-195)
                raw = raw.strip()
                if raw.startswith("```"):
                    raw = raw.strip("`")
                    raw = raw[4:] if raw.startswith("json") else raw
                out.append(raw)
            yield pd.DataFrame({"filename": pdf["filename"], "doc_json": out})

    parsed = df.mapInPandas(fn, schema="filename string, doc_json string")
    return parsed.withColumn("doc", F.from_json("doc_json", schema)).select(
        "filename", "doc.*"
    )
