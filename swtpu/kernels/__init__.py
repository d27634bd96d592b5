"""Device kernels (XLA + Pallas).

Importing any kernel module enables the persistent XLA compilation cache:
compiles through the tunnel's remote helper take 10-60 s each and dominate
selftest/fuzz/bench startup (measured: a cold 63 s first-call drops to
20 s in a fresh process with the cache). Artifacts are segregated per
platform config (see the inline comment). This lives here rather than in
the package __init__ so that oracle-only / numpy-only imports of ``swtpu``
never pay the jax import. Opt out with SWTPU_JAX_CACHE=0; a cache dir
already configured by the embedding application is never overridden.
"""

import os as _os

if _os.environ.get("SWTPU_JAX_CACHE", "1") != "0":
    import jax as _jax

    if not _jax.config.jax_compilation_cache_dir:
        # one subdirectory per (platform config, host fingerprint):
        # - a cpu-only run (tests, virtual meshes) must not reload
        #   artifacts written under a different backend mix — XLA:CPU AOT
        #   results record machine-feature pseudo-flags
        #   (prefer-no-scatter/gather) that differ across configs;
        # - artifacts compiled on a DIFFERENT HOST (a shared cache dir, a
        #   driver machine vs a dev machine) record that host's CPU
        #   feature set and trip "could lead to SIGILL" loader errors on
        #   reload. Hashing /proc/cpuinfo's flags into the key puts every
        #   distinct machine in its own subdir.
        _platforms = (
            _jax.config.jax_platforms
            or _os.environ.get("JAX_PLATFORMS")
            or "default"
        )
        _sub = _platforms.strip().lower().replace(",", "_") or "default"
        try:
            import hashlib as _hashlib

            with open("/proc/cpuinfo") as _f:
                _flags = next(
                    (l for l in _f if l.startswith("flags")), ""
                )
            _host = _hashlib.sha1(_flags.encode()).hexdigest()[:10]
        except OSError:  # non-Linux: fall back to platform-only keying
            _host = "nohost"
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.join(
                _os.environ.get(
                    "SWTPU_JAX_CACHE_DIR",
                    _os.path.expanduser("~/.cache/swtpu_jax"),
                ),
                f"{_sub}-{_host}",
            ),
        )
