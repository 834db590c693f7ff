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
    ):
        self.spark = spark
        self.checkpoint_root = checkpoint_root
        self.compile_fn = compile_fn
        self.sink = sink
        self.output_mode = output_mode
        self.configs: dict[str, dict] = {}
        self.queries: dict[str, object] = {}  # name -> StreamingQuery

    # -- internals ----------------------------------------------------------

    def _start(self, name: str, config: dict):
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
        self.queries[name] = writer.start()
        self.configs[name] = config

    def _stop(self, name: str):
        q = self.queries.pop(name, None)
        if q is not None:
            q.stop()
            q.awaitTermination(30)

    # -- IStreamHandler surface ---------------------------------------------

    def add_stream(self, name: str, config: dict):
        """add-stream (stream.clj:296-320): compile + start one
        stream; replaces a running stream of the same name."""
        _LOG.info("Adding stream %s", name)
        self._stop(name)
        self._start(name, config)

    def remove_stream(self, name: str):
        """remove-stream: stop the query; checkpoint stays on disk."""
        _LOG.info("Removing stream %s", name)
        self._stop(name)
        self.configs.pop(name, None)

    def list_streams(self) -> list[str]:
        return sorted(self.queries)

    def get_stream(self, name: str):
        return self.queries[name]

    def reload(self, new_configs: dict[str, dict]) -> dict[str, set]:
        """reload (stream.clj:227-296): diff against the running
        config, mutate only what changed, return the diff."""
        diff = diff_config(self.configs, new_configs)
        if diff["to_remove"]:
            _LOG.info("Removing streams %s", ", ".join(sorted(diff["to_remove"])))
        if diff["to_reload"]:
            _LOG.info("Reloading streams %s", ", ".join(sorted(diff["to_reload"])))
        if diff["to_add"]:
            _LOG.info("Adding new streams %s", ", ".join(sorted(diff["to_add"])))
        for name in diff["to_remove"]:
            self.remove_stream(name)
        for name in diff["to_reload"]:
            self._stop(name)
            self._start(name, new_configs[name])
        for name in diff["to_add"]:
            self._start(name, new_configs[name])
        return diff

    def process_all(self):
        """Test/ops helper: block until every stream drains its
        available input."""
        for q in self.queries.values():
            q.processAllAvailable()

    def stop_all(self):
        for name in list(self.queries):
            self._stop(name)
