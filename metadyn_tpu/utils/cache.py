"""Persistent compile-cache policy.

Two failure modes were observed (round 3) with a persistent JAX
compilation cache on the CPU platform:

1. **Cross-host poison.** XLA:CPU AOT executables embed the compiling
   host's CPU features (avx512/amx/``prefer-no-scatter`` …) without
   keying on them; ``/root`` persists across sessions while the machine
   rotates, so a shared dir handed this host another host's machine code
   (``cpu_aot_loader.cc`` feature-mismatch errors → SIGSEGV mid-suite).
2. **Same-host reload crash.** Even entries written by THIS host
   segfault on reload for the 8-virtual-device shard_map programs
   (reproduced 2/2 on ``test_cli_walkers_times_spatial``: cold compile
   passes, warm reload segfaults in the jitted executable) — an XLA:CPU
   AOT round-trip bug for multi-device executables.

Policy: the persistent cache is **disabled on the CPU platform** (the
test suite and the multichip dry run recompile fresh — they are
trace-bound, not compile-bound) and **enabled on the shared legacy dir
for TPU runs**, where executables target the chip, not the host CPU,
and reloads are safe and worth minutes of compile time.

Caveat (round-3 advisor): the policy keys on the platform SELECTED AT
FIRST COMPILE — JAX latches the cache on first use, and a MIXED
"axon,cpu" process that compiles on the TPU first and later runs CPU
programs (e.g. an in-process CPU dryrun after entry()) would look up
CPU-backend keys in the TPU-enabled dir, reproducing the AOT reload
segfault.  ``__graft_entry__.dryrun_multichip`` therefore refuses the
in-process CPU path whenever any backend is already initialized and
re-execs a fresh ``JAX_PLATFORMS=cpu`` child instead.
"""
import os


def _selected_platform() -> str:
    """First entry of the effective jax_platforms selection ('' unknown)."""
    plats = ""
    try:
        import jax

        plats = jax.config.jax_platforms or ""
    except Exception:
        pass
    plats = plats or os.environ.get("JAX_PLATFORMS", "")
    return plats.split(",")[0].strip().lower()


def enable_persistent_cache(min_compile_secs: float = 2.0):
    """Apply the cache policy for the currently-selected platform.

    ``METADYN_JAX_CACHE`` (the documented override, docs/guide.md) is
    used verbatim when set — on any platform.

    MUST run (or re-run after re-pinning ``jax_platforms``) BEFORE the
    first compile: JAX latches the compilation cache at first use
    (``_cache_initialized``), so a post-compile call would silently have
    no effect.  To make the re-pin case work anyway, a re-call resets
    the cache machinery when the policy changes.

    Returns the cache dir, or None when the cache is disabled or the
    config update failed (callers must not assume an active cache on a
    non-None request alone — failures are surfaced as None).
    """
    import jax

    path = os.environ.get("METADYN_JAX_CACHE")
    if path is None and _selected_platform() != "cpu":
        path = "/root/.jax_cache"
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        return None
    try:
        # un-latch: JAX caches its cache decision at first compile; a
        # policy change after that must reset it to take effect
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:
        pass
    return path
