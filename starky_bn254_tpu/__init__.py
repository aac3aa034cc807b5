"""starky_bn254_tpu — a TPU-native STARK proving framework for BN254 arithmetic.

Brand-new JAX/XLA/Pallas implementation with the capabilities of the reference
qope/starky-bn254 (Rust, see /root/reference): Starky-style AIRs over the
Goldilocks field proving BN254 Fq/Fq12 exponentiation and G1/G2 scalar
multiplication, built array-first for TPU rather than row-iterative.

The proving engine (Goldilocks arithmetic, NTT/LDE, Poseidon, Merkle, FRI,
STARK prover/verifier) is implemented from scratch here; the reference
delegates all of it to the external plonky2/starky Rust crates (SURVEY.md L1).
"""

import jax

# The whole framework computes over the Goldilocks field (p = 2^64 - 2^32 + 1)
# represented as canonical uint64 arrays; 64-bit types must be enabled before
# any jax.numpy op runs.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the unrolled field-op graphs are large; caching
# makes repeated runs (tests, benches) start fast.
import os as _os

# Keyed by platform AND a local-machine fingerprint: CPU entries are AOT
# code compiled for a specific microarchitecture, and mixing machines in one
# cache dir makes loads SIGILL/SIGSEGV sporadically (observed: cpu_aot_loader
# "machine features don't match" warnings followed by segfaults mid-test-run
# when a foreign `+prefer-no-scatter` executable was deserialized). Anything
# that shares this repo dir from another host now gets its own namespace.
# Consult the LIVE config first (tests/scripts switch platforms via
# jax.config.update before importing this package); fall back to the env.
# Keying off the env alone mislabeled axon-session CPU-AOT entries (remote
# helper output, `+prefer-no-scatter` machine prefs) into the cpu cache.
try:
    _platform_cfg = jax.config.jax_platforms or ""
except Exception:  # pragma: no cover
    _platform_cfg = ""
_platform = (
    _platform_cfg or _os.environ.get("JAX_PLATFORMS", "cpu")
).split(",")[0] or "cpu"


def _machine_fingerprint() -> str:
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha1(feats.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform as _pl

    return hashlib.sha1(_pl.processor().encode()).hexdigest()[:8]


# The axon PJRT plugin changes XLA:CPU's machine preferences
# (+prefer-no-scatter/+prefer-no-gather): CPU executables compiled with the
# plugin env present don't load cleanly in processes without it (observed:
# cpu_aot_loader feature-mismatch warnings, then a SIGSEGV inside
# deserialize_executable mid-test-run). Namespace the cache by that flag so
# the two flavors never mix.
_axon_env = "-ax" if _os.environ.get("PALLAS_AXON_POOL_IPS") else ""
_repo_cache = _os.path.join(
    _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
    f".jax_cache-{_platform}-{_machine_fingerprint()}{_axon_env}",
)
_cache_dir = _os.environ.get("STARKY_JAX_CACHE", _repo_cache)
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - older jax without the knob
    pass

# Cache WRITES go through zlib, not zstandard: zstandard.backend_c has
# segfaulted this jaxlib's put_executable_and_time twice (faulthandler dumps
# end inside the C compressor, single-threaded, plenty of free RAM) and a
# crashed prove loses minutes of remote AOT work. Reads still auto-detect:
# the 3+ GB of existing zstd-compressed entries (zstd magic 0x28B52FFD)
# decompress through zstandard (its read path has never faulted), zlib
# entries through zlib.
try:
    import zlib as _zlib

    from jax._src import compilation_cache as _jcc

    def _compress_zlib(executable: bytes) -> bytes:
        return _zlib.compress(executable)

    _ZSTD_MAGIC = b"\x28\xb5\x2f\xfd"
    _zstd_decompress = _jcc.decompress_executable

    def _decompress_auto(executable: bytes) -> bytes:
        if executable[:4] == _ZSTD_MAGIC:
            return _zstd_decompress(executable)
        return _zlib.decompress(executable)

    _jcc.compress_executable = _compress_zlib
    _jcc.decompress_executable = _decompress_auto

    # Cache writes run in a FORKED child: jaxlib's executable.serialize()
    # (XLA:CPU AOT export) segfaults deterministically on some of the
    # largest composition-segment executables (Fq12ExpU64 family; observed
    # across 4 runs, always at compilation_cache.put_executable_and_time).
    # A crash in the child just skips that entry — the prover keeps its
    # in-memory executable and the run continues; everything else still
    # lands in the persistent cache. The child takes a pre-fork alarm so a
    # fork-inherited lock can't hang it (COW makes the fork itself cheap).
    import signal as _signal
    import threading as _threading

    _orig_put = _jcc.put_executable_and_time

    def _forked_put(cache_key, module_name, executable, backend, compile_time):
        try:
            pid = _os.fork()
        except OSError:  # pragma: no cover
            return _orig_put(cache_key, module_name, executable, backend,
                             compile_time)
        if pid == 0:
            code = 1
            try:
                if _threading.current_thread() is _threading.main_thread():
                    _signal.alarm(180)
                _orig_put(cache_key, module_name, executable, backend,
                          compile_time)
                code = 0
            except BaseException:
                pass
            finally:
                _os._exit(code)
        else:
            _os.waitpid(pid, 0)

    _jcc.put_executable_and_time = _forked_put
except Exception:  # pragma: no cover - cache internals moved; lose nothing
    pass

# When the default platform is the tunneled TPU, ALSO expose the host CPU
# backend: verification is thousands of tiny scalar ops, and paying the
# tunnel's per-dispatch round trip for each made verify ~50x slower than
# proving. stark/verifier.py pins itself to the CPU device when available.
# Consult the LIVE config first: scripts/tests switch to cpu at runtime via
# jax.config.update and that choice must win over the env var.
try:
    _cfg_platforms = jax.config.jax_platforms or _os.environ.get(
        "JAX_PLATFORMS", ""
    )
except Exception:  # pragma: no cover
    _cfg_platforms = _os.environ.get("JAX_PLATFORMS", "")
if _cfg_platforms and "cpu" not in _cfg_platforms.split(","):
    try:
        jax.config.update("jax_platforms", f"{_cfg_platforms},cpu")
    except Exception:  # pragma: no cover - backends already initialized
        pass

__version__ = "0.1.0"
