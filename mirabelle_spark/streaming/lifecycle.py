"""Live control plane: add / remove / reload named streams.

The reference's IStreamHandler (stream.clj:144-151) holds a registry
of named stream configs; ``reload`` diffs the old and new config maps
(``new-config``, stream.clj:128-143) into to-remove / to-add /
to-reload sets and recompiles ONLY the changed streams — untouched
streams keep their closure state (the key operational property: a
config push must not reset unrelated alerting state).

Spark realization: each named stream is one Structured Streaming
query with its own checkpoint directory keyed by stream name.

- untouched: the running StreamingQuery is not touched at all —
  state trivially survives (same guarantee as the reference).
- to-reload: stop + restart against the SAME checkpoint dir; the
  state store and source offsets restore from checkpoint, so
  processed input is not re-read and compatible stateful operators
  (same aggregation/state schema) resume where they left off. This
  is strictly stronger than the reference, whose reload loses the
  closure state of the reloaded stream itself.
- to-remove: stop the query; its checkpoint dir is kept on disk
  (re-adding the name later resumes it — delete manually to reset).

Configs must be JSON-comparable dicts (the reference compares EDN
values the same way); the actual DataFrame construction is delegated
to a user ``compile_fn(spark, name, config) -> streaming DataFrame``
— typically the plans.builder tree compiler over a readStream
source.
"""

from __future__ import annotations

import logging
import os
import shutil
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

_LOG = logging.getLogger("mirabelle_spark.streaming.lifecycle")


def diff_config(old: dict, new: dict) -> dict[str, set]:
    """``new-config`` (stream.clj:128-143): name-set diff + value
    compare on the intersection."""
    old_names, new_names = set(old), set(new)
    return {
        "to_remove": old_names - new_names,
        "to_add": new_names - old_names,
        "to_reload": {n for n in old_names & new_names if old[n] != new[n]},
    }


class StreamHandler:
    """Registry + lifecycle for named streaming queries
    (IStreamHandler, stream.clj:144-151)."""

    def __init__(
        self,
        spark: SparkSession,
        checkpoint_root: str,
        compile_fn: Callable[[SparkSession, str, dict], DataFrame],
        sink: str = "memory",
        output_mode: str = "append",
        streams_dir: str | None = None,
        ingest_root: str | None = None,
    ):
        self.spark = spark
        self.checkpoint_root = checkpoint_root
        self.compile_fn = compile_fn
        self.sink = sink
        self.output_mode = output_mode
        self.streams_dir = streams_dir
        self.ingest_root = ingest_root
        self.configs: dict[str, dict] = {}
        self.queries: dict[str, object] = {}  # name -> StreamingQuery

    # -- internals ----------------------------------------------------------

    def _start(self, name: str, config: dict, _retry: bool = True):
        df = self.compile_fn(self.spark, name, config)
        writer = (
            df.writeStream.queryName(name)
            .outputMode(config.get("output_mode", self.output_mode))
            .format(config.get("sink", self.sink))
            .option(
                "checkpointLocation", os.path.join(self.checkpoint_root, name)
            )
        )
        for k, v in config.get("sink_options", {}).items():
            writer = writer.option(k, v)
        try:
            self.queries[name] = writer.start()
        except Exception as e:  # noqa: BLE001 - inspect, repair, retry once
            if (
                _retry
                and "STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY" in str(e)
                and self._reconcile_checkpoint(name)
            ):
                return self._start(name, config, _retry=False)
            raise
        self.configs[name] = config

    @staticmethod
    def _log_count(ckpt: str, log: str) -> int:
        """Count entries in a checkpoint metadata log (``offsets`` /
        ``commits``); filenames are batch ids (possibly ``N.compact``)."""
        try:
            return sum(
                1
                for f in os.listdir(os.path.join(ckpt, log))
                if f.partition(".")[0].isdigit()
            )
        except FileNotFoundError:
            return 0

    def _reconcile_checkpoint(self, name: str) -> bool:
        """Repair a checkpoint left by a query stopped mid-batch-0.

        If a query is stopped after batch 0 started but before the
        commit log recorded it, Spark 4 refuses to restart against
        the checkpoint (STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY:
        "the checkpoint location ... should be empty on batch 0").
        The refusal condition (MicroBatchExecution.
        populateStartOffsets → verifyNewCheckpointDirectory) is: the
        offset log has NO parseable entry, yet a raw listing of
        offsets/ or state/ or commits/ is non-empty — which is
        exactly what ``stop()`` interrupting the batch-0 offset
        write leaves behind (a .tmp/.crc debris file, or a complete
        offsets/0 with no commit). Nothing was durably produced
        (zero commits), so the correct repair is to clear the
        checkpoint and let the restart re-read the sources from
        scratch. A trailing uncommitted offset AFTER ≥1 commit is
        normal Spark replay and is left alone. Returns True if the
        checkpoint was cleared."""
        ckpt = os.path.join(self.checkpoint_root, name)
        if self._log_count(ckpt, "commits") > 0:
            return False
        # zero commits: the restart must begin at a clean batch 0,
        # and Spark's emptiness probe uses RAW directory listings —
        # count debris (.tmp/.crc), not just committed log entries
        debris: dict[str, list[str]] = {}
        for sub in ("offsets", "state", "commits"):
            d = os.path.join(ckpt, sub)
            try:
                entries = os.listdir(d)
            except FileNotFoundError:
                continue
            if entries:
                debris[sub] = sorted(entries)
        if not debris:
            return False
        # Expected uncommitted-batch-0 residue is ONLY: offsets/0 (or
        # its .tmp/.crc write debris) and state-store scaffolding. An
        # offsets entry for batch ≥1 with ZERO commits means this
        # checkpoint was never ours to repair (e.g. two streams
        # pointed at one dir) — flag it loudly either way.
        expected = all(
            f.partition(".")[0] in ("0", "") or f.startswith((".", "_"))
            for f in debris.get("offsets", []) + debris.get("commits", [])
        )
        # Never destroy: quarantine the stranded checkpoint so the
        # restart begins cleanly while the debris stays inspectable.
        qdir = f"{ckpt}.quarantine.{int(time.time() * 1e6)}"
        log = _LOG.warning if expected else _LOG.error
        log(
            "Stream %s: checkpoint %s has zero commits but debris %s "
            "(%s); quarantining to %s so restart begins at batch 0",
            name,
            ckpt,
            debris,
            "uncommitted batch-0 residue"
            if expected
            else "UNEXPECTED batch ids — possible checkpoint-dir collision",
            qdir,
        )
        try:
            os.rename(ckpt, qdir)
        except OSError:
            # cross-device or partial-state fallback: preserve a copy
            shutil.move(ckpt, qdir)
        return True

    def _stop(self, name: str, grace_s: float = 10.0, term_timeout_s: float = 30.0) -> dict:
        """Stop one query; never leave an unrestartable checkpoint.

        Returns ``{"stopped", "terminated", "reconciled"}``:
        ``stopped`` — a query existed; ``terminated`` — it exited
        within ``term_timeout_s`` of ``stop()`` (False is surfaced,
        not dropped); ``reconciled`` — the checkpoint held an
        uncommitted batch 0 and was cleared (see
        :meth:`_reconcile_checkpoint`). Before stopping, waits up to
        ``grace_s`` for a first commit if batch 0 is in flight
        (offsets written, commits empty) — a reload during a slow
        first batch must not strand the checkpoint (stream.clj:227-259:
        reload must never leave a changed stream dead)."""
        q = self.queries.pop(name, None)
        info = {"stopped": q is not None, "terminated": True, "reconciled": False}
        if q is None:
            return info
        ckpt = os.path.join(self.checkpoint_root, name)
        deadline = time.monotonic() + grace_s
        while (
            q.isActive
            and self._log_count(ckpt, "offsets") > 0
            and self._log_count(ckpt, "commits") == 0
            and time.monotonic() < deadline
        ):
            time.sleep(0.05)
        q.stop()
        info["terminated"] = bool(q.awaitTermination(int(term_timeout_s)))
        if not info["terminated"]:
            _LOG.error(
                "Stream %s did not terminate within %s s of stop()",
                name,
                term_timeout_s,
            )
        # belt and braces: batch 0 may have started between the grace
        # probe and stop(); repair any uncommitted-batch-0 residue
        info["reconciled"] = self._reconcile_checkpoint(name)
        return info

    def _persist_path(self, name: str) -> str:
        if not self.streams_dir:
            raise ValueError(
                "The stream cannot be saved. No directory configured for streams"
            )
        return os.path.join(self.streams_dir, f"api-{name}.json")

    # -- IStreamHandler surface ---------------------------------------------

    def add_stream(self, name: str, config: dict, persist: bool = False):
        """add-stream (stream.clj:276-296): compile + start one
        stream; replaces a running stream of the same name. With
        ``persist``, the config is written to ``streams_dir`` first
        (JSON mirror of the reference's persisted-stream EDN file) so
        it survives a restart / is picked up by ``load_persisted``."""
        _LOG.info("Adding stream %s", name)
        if persist:
            import json

            _LOG.info("The stream %s will be persisted", name)
            os.makedirs(self.streams_dir, exist_ok=True)
            with open(self._persist_path(name), "w") as f:
                json.dump({name: config}, f)
        self._stop(name)
        self._start(name, config)

    def remove_stream(self, name: str):
        """remove-stream (stream.clj:297-310): stop the query and
        delete its persisted config file if one exists; the
        checkpoint stays on disk (re-adding the name resumes it)."""
        _LOG.info("Removing stream %s", name)
        if self.streams_dir:
            path = os.path.join(self.streams_dir, f"api-{name}.json")
            if os.path.exists(path):
                _LOG.info("The stream %s will be removed from the filesystem", name)
                os.remove(path)
        self._stop(name)
        self.configs.pop(name, None)

    def load_persisted(self, probe_s: float = 2.0) -> dict:
        """Boot-time restore: reload from every ``streams_dir``
        config file (the reference reads streams-directories on
        start and after persisted add/remove)."""
        import json

        configs: dict[str, dict] = {}
        if self.streams_dir and os.path.isdir(self.streams_dir):
            for fname in sorted(os.listdir(self.streams_dir)):
                if fname.endswith(".json"):
                    with open(os.path.join(self.streams_dir, fname)) as f:
                        configs.update(json.load(f))
        return self.reload(configs, probe_s=probe_s)

    def ingest_dir(self, name: str) -> str:
        """Per-stream file-drop ingest directory (the Spark analog of
        the reference's push!/PUT event endpoint: new files become
        micro-batches of the stream's file source)."""
        if not self.ingest_root:
            raise ValueError("no ingest_root configured")
        d = os.path.join(self.ingest_root, name)
        os.makedirs(d, exist_ok=True)
        return d

    def push_events(self, name: str, events: list[dict]) -> int:
        """push! (stream.clj:261-275): route events into a named
        stream. Spark realization: append one JSON-lines file to the
        stream's ingest dir — the running file source picks it up as
        the next micro-batch."""
        import json
        import uuid

        if name not in self.queries:
            raise KeyError(f"Stream {name} not found")
        d = self.ingest_dir(name)
        fname = f"push-{uuid.uuid4().hex}.json"
        # stage OUTSIDE the watched dir (the file source globs every
        # file under it, including half-written ones), rename in
        stage = os.path.join(self.ingest_root, f".staging-{fname}")
        with open(stage, "w") as f:
            for e in events:
                f.write(json.dumps(e) + "\n")
        os.rename(stage, os.path.join(d, fname))
        return len(events)

    def list_streams(self) -> list[str]:
        return sorted(self.queries)

    def get_stream(self, name: str):
        return self.queries[name]

    def reload(self, new_configs: dict[str, dict], probe_s: float = 2.0) -> dict:
        """reload (stream.clj:227-296): diff against the running
        config, mutate only what changed, return the diff.

        The returned dict carries a ``failed`` map (name → error):
        Structured Streaming rejects incompatible checkpoint changes
        (state schema, number/type of stateful operators)
        *asynchronously after* ``start()`` returns, so a reload can
        look successful while the restarted query is already dead.
        Every (re)started query is probed for up to ``probe_s``
        seconds via ``q.exception()`` before reload reports back. A
        probe failure caused by an uncommitted-batch-0 checkpoint
        (the stop/restart race) is repaired in place — reconcile +
        one restart — rather than reported, so a config push during
        a slow first batch cannot kill the stream.
        """
        diff = diff_config(self.configs, new_configs)
        if diff["to_remove"]:
            _LOG.info("Removing streams %s", ", ".join(sorted(diff["to_remove"])))
        if diff["to_reload"]:
            _LOG.info("Reloading streams %s", ", ".join(sorted(diff["to_reload"])))
        if diff["to_add"]:
            _LOG.info("Adding new streams %s", ", ".join(sorted(diff["to_add"])))
        for name in diff["to_remove"]:
            self.remove_stream(name)
        failed: dict[str, str] = {}
        for name in sorted(diff["to_reload"]):
            self._stop(name)
            try:
                self._start(name, new_configs[name])
            except Exception as e:  # noqa: BLE001 - report, don't abort the batch
                failed[name] = f"start failed: {e}"
        for name in sorted(diff["to_add"]):
            try:
                self._start(name, new_configs[name])
            except Exception as e:  # noqa: BLE001
                failed[name] = f"start failed: {e}"
        pending = [
            n for n in sorted(diff["to_reload"] | diff["to_add"]) if n not in failed
        ]
        repaired: set[str] = set()
        deadline = time.monotonic() + probe_s
        while pending and time.monotonic() < deadline:
            for name in list(pending):
                q = self.queries.get(name)
                exc = None if q is None else q.exception()
                if exc is not None:
                    if (
                        name not in repaired
                        and "STATE_STORE_CHECKPOINT_LOCATION_NOT_EMPTY" in str(exc)
                        and self._reconcile_checkpoint(name)
                    ):
                        repaired.add(name)
                        self.queries.pop(name, None)
                        try:
                            self._start(name, new_configs[name])
                            continue  # keep probing the restarted query
                        except Exception as e:  # noqa: BLE001
                            failed[name] = f"restart after reconcile failed: {e}"
                    else:
                        failed[name] = str(exc)
                    pending.remove(name)
                elif q is not None and not q.isActive:
                    failed[name] = "terminated without exception"
                    pending.remove(name)
            if pending:
                time.sleep(0.1)
        for name, err in failed.items():
            _LOG.error("Stream %s failed after reload: %s", name, err.splitlines()[0])
        diff["failed"] = failed
        return diff

    def process_all(self):
        """Test/ops helper: block until every stream drains its
        available input."""
        for q in self.queries.values():
            q.processAllAvailable()

    def stop_all(self) -> dict[str, dict]:
        """Stop every stream; returns per-stream :meth:`_stop` info so
        callers (the soak, tests) can assert clean terminations."""
        return {name: self._stop(name) for name in list(self.queries)}
