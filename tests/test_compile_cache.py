"""Persistent compile cache keying (ops/backend.py).

XLA's persistent-cache hash does not cover the loading host's CPU
features; a CPU AOT artifact from a bigger-ISA VM loads here with a
"could lead to SIGILL" error (observed under hypervisor migration).
The default cache directory is therefore keyed by a host-CPU
fingerprint so cross-machine artifacts are never even looked up."""

import os

from kmerset_tpu.ops import backend


def test_default_cache_dir_is_host_keyed(monkeypatch):
    monkeypatch.delenv("KMERSET_TPU_COMPILE_CACHE", raising=False)
    import jax

    backend.enable_compile_cache()
    fp = backend._host_cpu_fingerprint()
    assert len(fp) == 10
    assert jax.config.jax_compilation_cache_dir.endswith(f"kmerset_tpu_jax_{fp}")


def test_fingerprint_stable():
    assert backend._host_cpu_fingerprint() == backend._host_cpu_fingerprint()


def test_env_override_wins(monkeypatch):
    import jax

    prev = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("KMERSET_TPU_COMPILE_CACHE", "/tmp/kmerset_cache_test")
    try:
        backend.enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == "/tmp/kmerset_cache_test"
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
