"""PYTHONPATH shim for the transformWithStateInPandas experiment
(tools/bench_streaming_state.py --modes tws).

This container has no google.protobuf package, but the Google Cloud
SDK's App Engine platform dir bundles a pure-python protobuf runtime
(6.32). Spark's generated StateMessage_pb2 is gencode 6.33; protobuf
hard-fails when the runtime is OLDER than the gencode, so after
putting the bundled runtime on sys.path we relax that validator for
the one-minor-version gap (descriptor wire format is stable across
it; the bench is an A/B measurement, not a production path — the
production tiers are the sharded/JVM twins in streaming/core.py).

Loaded automatically (python imports `sitecustomize` from sys.path)
by BOTH the driver and every Spark python worker when this directory
leads PYTHONPATH — which is exactly how bench_streaming_state
arranges it before building the SparkSession.
"""

import os
import sys

_GAE = "/usr/lib/google-cloud-sdk/platform/google_appengine"

if os.path.isdir(os.path.join(_GAE, "google", "protobuf")):
    sys.path.insert(0, _GAE)
    try:
        from google.protobuf import runtime_version as _rv

        _orig = _rv.ValidateProtobufRuntimeVersion

        def _lenient(domain, gen_major, gen_minor, *rest):
            try:
                _orig(domain, gen_major, gen_minor, *rest)
            except _rv.VersionError:
                if (gen_major, gen_minor) <= (
                    _rv.MAJOR,
                    _rv.MINOR + 1,
                ):  # tolerate gencode one minor ahead
                    return
                raise

        _rv.ValidateProtobufRuntimeVersion = _lenient
    except Exception:
        pass
