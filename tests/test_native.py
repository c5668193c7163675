"""Native C++ tier (fastcsv): printf-%f parity with the Python path,
parse round-trips, and the throughput claim."""

import time

import numpy as np
import pytest

from gokalman_tpu import native


def test_native_builds_in_this_environment():
    # g++ is part of the baked toolchain; the library must build here.
    assert native.available(), "g++ build of fastcsv failed"


def test_format_matches_python_percent_f():
    rng = np.random.default_rng(3)
    m = np.concatenate([
        rng.standard_normal((40, 7)) * 10.0 ** rng.integers(-8, 8, (40, 7)),
        np.array([[0.0, -0.0, 1e-7, -1e-7, 123456789.5, 0.5, -2.5]]),
    ])
    text = native.format_csv(m)
    assert text is not None
    expect = "\n".join(
        ",".join(f"{v:f}" for v in row) for row in m
    ) + "\n"
    assert text == expect


def test_parse_round_trip_and_nan():
    rng = np.random.default_rng(9)
    vals = rng.standard_normal(257)
    text = ",".join(repr(float(v)) for v in vals)
    out = native.parse_floats(text)
    np.testing.assert_allclose(out, vals, rtol=0, atol=0)
    out2 = native.parse_floats("1.5,NaN,2.5\nnan,-3.0")
    assert out2.shape == (5,)
    assert np.isnan(out2[1]) and np.isnan(out2[3])
    np.testing.assert_allclose(out2[[0, 2, 4]], [1.5, 2.5, -3.0])


def test_exporter_output_unchanged_by_native_path(tmp_path, monkeypatch):
    """write_all through the native formatter must produce the exact
    bytes of the Python fallback."""
    import jax.numpy as jnp

    from gokalman_tpu import exporter
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import vanilla

    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    model, st = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                            gn.noiseless(0.01 * jnp.eye(2), jnp.eye(1)))
    ys = jnp.asarray(np.random.default_rng(1).standard_normal((25, 1)))
    _, ests = vanilla.run(model, st, measurements=ys)

    def dump(name, force_fallback):
        if force_fallback:
            monkeypatch.setattr(native, "format_csv", lambda m: None)
        else:
            monkeypatch.undo()
        with exporter.CSVExporter(["x", "v"], tmp_path, name, 2.0) as e:
            e.write_all(ests)
        lines = [l for l in open(tmp_path / name) if not l.startswith("#")]
        return "".join(lines)

    native_out = dump("n.csv", False)
    python_out = dump("p.csv", True)
    assert native_out == python_out


def test_native_formatter_is_fast():
    """The reason the tier exists: >= 5x over Python formatting on a
    trace-sized matrix (typically ~30x; the gate is conservative)."""
    if not native.available():
        pytest.skip("native tier unavailable")
    rng = np.random.default_rng(0)
    m = rng.standard_normal((400, 500))
    native.format_csv(np.zeros((2, 2)))  # warm: one-time library load
    t_native = min(
        _timed(lambda: native.format_csv(m)) for _ in range(3)
    )
    text = native.format_csv(m)
    t_python = min(
        _timed(lambda: "\n".join(
            ",".join(f"{v:f}" for v in row) for row in m
        ))
        for _ in range(3)
    )
    expect = "\n".join(",".join(f"{v:f}" for v in row) for row in m) + "\n"
    assert text == expect
    assert t_python > 5 * t_native, (t_python, t_native)


def _timed(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0
