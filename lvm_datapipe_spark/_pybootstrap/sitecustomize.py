"""Auto-bootstrap for Spark-spawned Python processes (workers, daemons,
and the transformWithState driver worker — the latter is spawned directly,
NOT through pyspark.daemon, so a daemon-module shim cannot reach it).

The session prepends this directory to the PYTHONPATH it hands the JVM
(see lvm_datapipe_spark.session.get_spark) ONLY when google.protobuf
resolves via the fallback path probe; Python's site machinery then imports
this module at interpreter startup in every spawned process, applying the
same protobuf bootstrap the driver got.  Self-loading by file path so it
works even when the package itself is not importable yet."""

try:
    import importlib.util as _ilu
    import os as _os

    _compat = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
        "protobuf_compat.py",
    )
    _spec = _ilu.spec_from_file_location("_lvm_protobuf_compat", _compat)
    _mod = _ilu.module_from_spec(_spec)
    _spec.loader.exec_module(_mod)
    _mod.ensure_protobuf()
except Exception:  # never break an interpreter over an optional dep
    pass
