"""Pluggable LogStore (round 15): the commit put-if-absent seam.

POSIX O_EXCL is the spec's filesystem rule, but S3 has no atomic
put-if-absent — delta-spark arbitrates through an external DynamoDB
table (S3DynamoDBLogStore). :class:`CoordinatedLogStore` reproduces
that recipe with a locally-testable coordination directory; these
tests prove both stores give the same multi-writer guarantees, and
that the coordinated store's crash fixup completes half-landed
commits.
"""

import json
import os
import threading

import pytest

from mack_spark.sources.delta_log import (
    DeltaProtocolTable,
    clear_replay_cache,
)
from mack_spark.sources.log_store import (
    CoordinatedLogStore,
    LogStoreConflict,
    PosixLogStore,
)
from mack_spark.tables import ConcurrentModificationError


@pytest.fixture(params=["posix", "coordinated"])
def store_factory(request, tmp_path):
    """() -> a fresh LogStore of the parametrized kind (coordinated
    stores share one coordinator dir, like writers sharing one
    DynamoDB table)."""
    if request.param == "posix":
        return lambda: PosixLogStore()
    coord = str(tmp_path / "coordinator")
    return lambda: CoordinatedLogStore(coord)


def _mk(spark, tmp_path, store, n=6):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(n)], "pk int, attr string"
    )
    return DeltaProtocolTable.create(
        spark, str(tmp_path / "t"), df, log_store=store
    )


class TestPutIfAbsentContract:
    def test_second_put_conflicts(self, store_factory, tmp_path):
        os.makedirs(tmp_path / "_delta_log", exist_ok=True)
        p = str(tmp_path / "_delta_log" / ("%020d.json" % 0))
        s1, s2 = store_factory(), store_factory()
        s1.put_if_absent(p, "one\n")
        with pytest.raises(LogStoreConflict):
            s2.put_if_absent(p, "two\n")
        assert open(p).read() == "one\n"  # winner's bytes intact

    def test_threaded_race_exactly_one_wins(self, store_factory, tmp_path):
        os.makedirs(tmp_path / "_delta_log", exist_ok=True)
        p = str(tmp_path / "_delta_log" / ("%020d.json" % 7))
        n = 8
        barrier = threading.Barrier(n)
        results = [None] * n

        def run(i):
            store = store_factory()
            barrier.wait(timeout=30)
            try:
                store.put_if_absent(p, f"writer-{i}\n")
                results[i] = "won"
            except LogStoreConflict:
                results[i] = "lost"

        ts = [threading.Thread(target=run, args=(i,)) for i in range(n)]
        [t.start() for t in ts]
        [t.join(timeout=60) for t in ts]
        assert results.count("won") == 1, results
        winner = results.index("won")
        assert open(p).read() == f"writer-{winner}\n"


class TestTableOverStores:
    def test_stale_commit_raises_and_state_consistent(
        self, spark, tmp_path, store_factory
    ):
        t = _mk(spark, tmp_path, store_factory())
        stale = t.snapshot()
        t.append(spark.createDataFrame([(100, "w")], "pk int, attr string"))
        with pytest.raises(ConcurrentModificationError):
            t._commit(stale.version + 1, [{"commitInfo": {"timestamp": 0}}],
                      snap=stale)
        assert t.to_df().count() == 7
        assert t.snapshot().version == 1

    def test_mutation_retries_over_blind_append(
        self, spark, tmp_path, store_factory, monkeypatch
    ):
        """The WriteSerializable retry loop works identically through
        either store: a rival non-matching blind append interleaves,
        the DELETE retries and lands."""
        t = _mk(spark, tmp_path, store_factory())
        orig = DeltaProtocolTable._commit
        state = {"fired": False}

        def racing(self, version, actions, snap=None):
            if not state["fired"]:
                state["fired"] = True
                rival = DeltaProtocolTable(
                    spark, self.path, log_store=self.log_store
                )
                rival.append(spark.createDataFrame(
                    [(500, "rival")], "pk int, attr string"
                ))
            return orig(self, version, actions, snap=snap)

        monkeypatch.setattr(DeltaProtocolTable, "_commit", racing)
        t.delete_where("pk = 3")
        rows = {r["pk"] for r in t.to_df().collect()}
        assert 3 not in rows and 500 in rows
        assert len(rows) == 6


class TestCoordinatedCrashFixup:
    def _coord(self, tmp_path):
        return CoordinatedLogStore(str(tmp_path / "coordinator"))

    def test_claimed_but_missing_commit_is_completed_on_read(
        self, spark, tmp_path
    ):
        """Crash between claim and final PUT: the version exists only
        as (claim, temp). A fresh reader must surface it — the commit
        is durable the moment the claim lands."""
        store = self._coord(tmp_path)
        t = _mk(spark, tmp_path, store)
        t.append(spark.createDataFrame([(7, "z")], "pk int, attr string"))
        logdir = os.path.join(t.path, "_delta_log")
        vf = os.path.join(logdir, "%020d.json" % 1)
        payload = open(vf).read()
        # simulate the crash window: final object vanishes, claim says
        # complete=False again, temp holds the bytes
        claims = store._claims_dir(logdir)
        claim = next(
            os.path.join(claims, c) for c in os.listdir(claims)
            if c.endswith("%020d.json.claim" % 1)
        )
        item = json.load(open(claim))
        with open(item["temp"], "w") as fh:
            fh.write(payload)
        store._update_claim(claim, dict(item, complete=False))
        os.unlink(vf)
        clear_replay_cache(t.path)
        t2 = DeltaProtocolTable(spark, t.path, log_store=store)
        assert t2.snapshot().version == 1
        assert t2.to_df().count() == 7
        assert os.path.exists(vf)  # reconcile rematerialized it

    def test_loser_of_claim_race_fixes_winner_forward(self, tmp_path):
        """A writer that loses the claim finds the winner crashed
        mid-copy and completes the winner's commit before raising."""
        store = self._coord(tmp_path)
        os.makedirs(tmp_path / "_delta_log", exist_ok=True)
        log_dir = str(tmp_path / "_delta_log")
        final = os.path.join(log_dir, "%020d.json" % 3)
        # winner claimed but never PUT the final object
        temp = os.path.join(log_dir, ".tmp", "w1-%020d.json" % 3)
        os.makedirs(os.path.dirname(temp), exist_ok=True)
        with open(temp, "w") as fh:
            fh.write("winner-bytes\n")
        assert store._conditional_insert(
            store._claim_path(log_dir, "%020d.json" % 3),
            {"temp": temp, "complete": False},
        )
        with pytest.raises(LogStoreConflict):
            store.put_if_absent(final, "loser-bytes\n")
        assert open(final).read() == "winner-bytes\n"

    def test_no_exclusive_create_in_log_dir(self, tmp_path):
        """The coordinated store must not rely on O_EXCL of the log
        object: a pre-existing final file with DIFFERENT bytes (e.g. a
        retried PUT of the same claimed commit) is overwritten, not an
        error — arbitration is the coordinator's job alone."""
        store = self._coord(tmp_path)
        os.makedirs(tmp_path / "_delta_log", exist_ok=True)
        p = str(tmp_path / "_delta_log" / ("%020d.json" % 0))
        with open(p, "w") as fh:
            fh.write("stale-partial\n")
        store.put_if_absent(p, "fresh\n")
        assert open(p).read() == "fresh\n"

    def test_claim_ttl_prunes_completed(self, tmp_path):
        store = CoordinatedLogStore(
            str(tmp_path / "coordinator"), claim_ttl_seconds=0
        )
        os.makedirs(tmp_path / "_delta_log", exist_ok=True)
        log_dir = str(tmp_path / "_delta_log")
        p = os.path.join(log_dir, "%020d.json" % 0)
        store.put_if_absent(p, "x\n")
        claims = store._claims_dir(log_dir)
        assert any(c.endswith(".claim") for c in os.listdir(claims))
        store.reconcile(log_dir)
        assert not any(c.endswith(".claim") for c in os.listdir(claims))
        assert os.path.exists(p)  # pruning never touches the log
