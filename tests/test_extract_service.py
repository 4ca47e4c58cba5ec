"""Law tests for the rate-limited polling-service extractor adapter
(round 12 — VERDICT r11 Next-round #7): the reference's LLMWhisperer
loop semantics (5 s poll / 300 s timeout / 3 retries / 2^n backoff —
reference src/etl/extract.py:111-166) against a hermetic fake service
that injects errors, 429s, slow jobs, and timeouts; plus the per-task
in-flight concurrency bound and the Spark mapInPandas E2E."""

import pytest

from owl_etl_spark.sources.extract import (
    PollingServiceExtractor,
    ServiceError,
    extract_text_service,
)


class FakeService:
    """Deterministic polling service scripted PER DOCUMENT (keyed by
    content, so the schedule is independent of submission interleaving
    under pipelining). ``script[content]`` is the list of behaviors
    for that document's successive ATTEMPTS — ("ok", polls_needed),
    ("error", msg), ("reject", msg) — submit itself raises —
    ("hang",) — never completes — ("empty",) — completes blank; the
    last entry repeats if attempts exceed the list. Records every call
    and the concurrent in-flight high-water mark."""

    def __init__(self, script):
        self.script = {k: list(v) for k, v in script.items()}
        self.attempts = {k: 0 for k in script}
        self.jobs = {}
        self.calls = []
        self.n_submits = 0
        self.in_flight = set()
        self.max_in_flight_seen = 0

    def _behavior(self, content: bytes):
        behs = self.script[content]
        i = min(self.attempts[content], len(behs) - 1)
        self.attempts[content] += 1
        return behs[i]

    def submit(self, content: bytes) -> str:
        content = bytes(content)
        self.n_submits += 1
        beh = self._behavior(content)
        self.calls.append(("submit", content, self.attempts.get(content, 0)))
        if beh[0] == "reject":
            raise ServiceError(beh[1])
        job = f"job{self.n_submits - 1}"
        self.jobs[job] = {"beh": beh, "polls": 0, "content": content}
        self.in_flight.add(job)
        self.max_in_flight_seen = max(self.max_in_flight_seen, len(self.in_flight))
        return job

    def status(self, job: str) -> dict:
        j = self.jobs[job]
        j["polls"] += 1
        self.calls.append(("status", j["content"], j["polls"]))
        kind = j["beh"][0]
        if kind == "error":
            self.in_flight.discard(job)
            return {"state": "error", "error": j["beh"][1]}
        if kind == "hang":
            return {"state": "processing"}
        needed = j["beh"][1] if kind == "ok" else 0
        if j["polls"] > needed:
            return {"state": "processed"}
        return {"state": "processing"}

    def retrieve(self, job: str) -> str:
        j = self.jobs[job]
        self.calls.append(("retrieve", j["content"]))
        self.in_flight.discard(job)
        if j["beh"][0] == "empty":
            return "   "
        return f"TEXT<{j['content'].decode()}>"


def _adapter(service, sleeps, **kw):
    kw.setdefault("poll_interval", 5.0)
    kw.setdefault("max_wait", 300.0)
    kw.setdefault("max_retries", 3)
    kw.setdefault("backoff_base", 1.0)
    return PollingServiceExtractor(service, sleep=sleeps.append, **kw)


# ---------------------------------------------------------------------------
# single-document laws: the reference schedule, exactly
# ---------------------------------------------------------------------------


def test_backoff_schedule_two_failures_then_success():
    """Attempts 1 and 2 fail instantly (service error at first status
    check): the sleep log must be exactly the reference's backoff
    ladder [2^0, 2^1] — no poll sleeps, since each error surfaces at
    the immediate post-submit status check."""
    svc = FakeService({b"doc": [("error", "boom"), ("error", "boom"), ("ok", 0)]})
    sleeps = []
    text = _adapter(svc, sleeps).extract_one(b"doc")
    assert text == "TEXT<doc>"
    assert sleeps == [1.0, 2.0]
    assert svc.n_submits == 3


def test_poll_schedule_slow_job():
    """A job that needs 2 'processing' polls before 'processed': the
    reference loop checks status, THEN sleeps 5 s — so the sleep log
    is [5, 5] and there are exactly 3 status calls."""
    svc = FakeService({b"x": [("ok", 2)]})
    sleeps = []
    assert _adapter(svc, sleeps).extract_one(b"x") == "TEXT<x>"
    assert sleeps == [5.0, 5.0]
    assert [c for c in svc.calls if c[0] == "status"] == [
        ("status", b"x", 1), ("status", b"x", 2), ("status", b"x", 3)
    ]


def test_timeout_polls_exactly_max_wait_over_interval_times():
    """max_wait=20, poll=5: the reference loop status-checks at
    elapsed 0/5/10/15 (4 checks), then the 20 s mark times the attempt
    out WITHOUT another check. With retries exhausted the document is
    quarantined, and the backoff ladder appears between attempts."""
    svc = FakeService({b"x": [("hang",)]})
    sleeps = []
    ad = _adapter(svc, sleeps, max_wait=20.0)
    text, err = ad.extract_many([b"x"])[0]
    assert text is None and "timeout after 20.0s" in err
    assert svc.n_submits == 3
    # every attempt polls exactly 4 times before its timeout
    polls = [c for c in svc.calls if c[0] == "status"]
    assert len(polls) == 12 and max(p[2] for p in polls) == 4
    # 4 poll sleeps per attempt, backoff 1 then 2 between the attempts
    assert sleeps == [5.0] * 4 + [1.0] + [5.0] * 4 + [2.0] + [5.0] * 4


def test_rate_limited_submit_counts_as_attempt_with_backoff():
    """submit() raising (HTTP 429 shape) is an attempt failure: backed
    off and retried, succeeding on the third try."""
    svc = FakeService({b"d": [("reject", "429"), ("reject", "429"), ("ok", 0)]})
    sleeps = []
    assert _adapter(svc, sleeps).extract_one(b"d") == "TEXT<d>"
    assert sleeps == [1.0, 2.0]


def test_empty_text_retries_then_succeeds():
    """The reference raises on blank extractions; the adapter retries
    the attempt (a transient service hiccup) before quarantining."""
    svc = FakeService({b"d": [("empty",), ("ok", 0)]})
    sleeps = []
    assert _adapter(svc, sleeps).extract_one(b"d") == "TEXT<d>"
    assert sleeps == [1.0]


def test_exhausted_retries_quarantine_not_raise_in_many():
    svc = FakeService({b"d": [("error", "e1"), ("error", "e2"), ("error", "e3")]})
    text, err = _adapter(svc, []).extract_many([b"d"])[0]
    assert text is None and "service error: e3" in err
    # extract_one surfaces the same terminal failure as an exception
    svc2 = FakeService({b"d": [("error", "x")]})
    with pytest.raises(ServiceError, match="service error: x"):
        _adapter(svc2, []).extract_one(b"d")


# ---------------------------------------------------------------------------
# pipelining laws
# ---------------------------------------------------------------------------


def test_in_flight_concurrency_is_bounded_and_used():
    """10 slow documents, max_in_flight=3: the fake's high-water mark
    must be exactly 3 — the bound holds AND the pipeline actually
    fills it (a serial loop would show 1)."""
    docs = [f"d{i}".encode() for i in range(10)]
    svc = FakeService({d: [("ok", 2)] for d in docs})
    sleeps = []
    out = _adapter(svc, sleeps, max_in_flight=3).extract_many(docs)
    assert [t for t, _ in out] == [f"TEXT<d{i}>" for i in range(10)]
    assert svc.max_in_flight_seen == 3
    # multiplexed polling: 10 docs x 2 processing-polls each on a
    # shared clock is far cheaper than the serial 10 x [5,5]
    assert len(sleeps) < 20


def test_pipelined_results_keep_input_order_with_mixed_outcomes():
    svc = FakeService({
        b"a": [("ok", 1)],
        b"b": [("error", "transient"), ("ok", 0)],
        b"c": [("ok", 0)],
        b"d": [("hang",)],
        b"e": [("ok", 1)],
    })
    sleeps = []
    out = _adapter(svc, sleeps, max_in_flight=2, max_wait=10.0).extract_many(
        [b"a", b"b", b"c", b"d", b"e"]
    )
    texts = [t for t, _ in out]
    errs = [e for _, e in out]
    assert texts[0] == "TEXT<a>" and texts[2] == "TEXT<c>" and texts[4] == "TEXT<e>"
    assert texts[1] == "TEXT<b>"  # recovered on retry
    assert texts[3] is None and "timeout" in errs[3]
    assert svc.attempts[b"d"] == 3  # the hanging doc used all retries


def test_backoff_eligibility_is_respected_under_pipelining():
    """A failed document must NOT be resubmitted before its backoff
    expires even when slots are free: with backoff_base=7 and
    poll_interval=5, doc b's ongoing polls at t=5 happen before doc
    a's resubmission (eligible only at t=7)."""
    svc = FakeService({b"a": [("error", "x"), ("ok", 0)], b"b": [("ok", 1)]})
    sleeps = []
    out = _adapter(svc, sleeps, max_in_flight=2, backoff_base=7.0).extract_many([b"a", b"b"])
    assert [t for t, _ in out] == ["TEXT<a>", "TEXT<b>"]
    resubmit_i = next(i for i, c in enumerate(svc.calls) if c == ("submit", b"a", 2))
    b_polls_before = [c for c in svc.calls[:resubmit_i] if c[0] == "status" and c[1] == b"b"]
    assert len(b_polls_before) >= 2  # b polled through t=5 before a's retry


def test_sleeps_to_next_eligibility_when_nothing_in_flight():
    """Sole document backing off: the adapter sleeps exactly the
    remaining backoff instead of spinning poll-interval ticks."""
    svc = FakeService({b"d": [("error", "x"), ("ok", 0)]})
    sleeps = []
    assert _adapter(svc, sleeps, backoff_base=9.0).extract_one(b"d") == "TEXT<d>"
    assert sleeps == [9.0]


# ---------------------------------------------------------------------------
# Spark E2E
# ---------------------------------------------------------------------------


def test_extract_text_service_mapinpandas_e2e(spark, tmp_path):
    """The full S1->S2 shape against the fake service: binary scan ->
    service adapter -> (text, error) columns, quarantine included.
    The factory constructs the service on the worker (picklable)."""
    import pyspark.sql.functions as F

    docs = [("good_1.pdf", b"alpha"), ("good_2.pdf", b"beta"), ("bad_1.pdf", b"gamma")]
    for name, body in docs:
        (tmp_path / name).write_bytes(body)
    df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.pdf")
        .load(str(tmp_path))
        .select(
            "path",
            F.element_at(F.split("path", "/"), -1).alias("filename"),
            "content",
        )
        .repartition(1)  # one task == one rate-limit domain
    )
    def factory():
        # defined inside the test so cloudpickle ships it by VALUE
        # (the test module is not importable on Spark workers); the
        # production pattern is identical: construct the client in the
        # factory, on the worker.
        class WorkerService:
            def __init__(self):
                self.n = 0
                self.jobs = {}

            def submit(self, content: bytes) -> str:
                job = f"job{self.n}"
                self.n += 1
                self.jobs[job] = {"content": bytes(content), "polls": 0}
                return job

            def status(self, job: str) -> dict:
                j = self.jobs[job]
                j["polls"] += 1
                if j["content"].startswith(b"gamma"):
                    return {"state": "error", "error": "doc rejected"}
                return {"state": "processed" if j["polls"] > 1 else "processing"}

            def retrieve(self, job: str) -> str:
                return f"TEXT<{self.jobs[job]['content'].decode()}>"

        return WorkerService()

    out = extract_text_service(
        df,
        factory,
        poll_interval=0.0,  # hermetic: no real sleeping in CI
        backoff_base=0.0,
        max_in_flight=2,
    )
    rows = {r.filename: r for r in out.collect()}
    assert rows["good_1.pdf"].extracted_text == "TEXT<alpha>"
    assert rows["good_2.pdf"].extracted_text == "TEXT<beta>"
    assert rows["good_1.pdf"].extract_error is None
    assert rows["bad_1.pdf"].extracted_text is None
    assert "service error" in rows["bad_1.pdf"].extract_error


def test_zero_poll_interval_still_times_out_hanging_jobs():
    """poll_interval=0 (hermetic tests) must not spin forever on a
    hanging job: timeout accounting advances a 1 s virtual quantum per
    poll tick, so a hang exhausts max_wait and retries normally."""
    svc = FakeService({b"x": [("hang",)]})
    sleeps = []
    ad = _adapter(svc, sleeps, poll_interval=0.0, max_wait=3.0, backoff_base=0.0)
    text, err = ad.extract_many([b"x"])[0]
    assert text is None and "timeout" in err
    assert svc.n_submits == 3  # all retries ran, nothing spun
