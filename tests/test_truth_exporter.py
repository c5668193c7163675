"""Ground-truth comparator and CSV exporter tests."""

import os

import jax.numpy as jnp
import numpy as np

from gokalman_tpu import truth as gt
from gokalman_tpu.exporter import CSVExporter, new_csv_exporter
from gokalman_tpu.filters.vanilla import Estimate


def _est(x, p=None):
    x = jnp.asarray(x)
    n = x.shape[0]
    p = jnp.eye(n) if p is None else p
    return Estimate(x, jnp.zeros(1), jnp.zeros(1), p, p, jnp.zeros((n, 1)))


def test_error_with_offset():
    states = jnp.array([[1.0, 2.0], [3.0, 4.0]])
    meas = jnp.array([[0.5], [0.5]])
    bt = gt.BatchGroundTruth(states, meas)
    est = _est([1.5, 2.5])._replace(measurement=jnp.array([1.0]))
    err = gt.error(bt, 0, est)
    np.testing.assert_allclose(np.asarray(err.state), [0.5, 0.5])
    np.testing.assert_allclose(np.asarray(err.measurement), [0.5])
    err2 = gt.error(bt, 1, est, offset=jnp.array([1.0, 1.0]))
    np.testing.assert_allclose(np.asarray(err2.state), [-0.5, -0.5])
    # Covariance preserved (truth.go:59).
    np.testing.assert_allclose(np.asarray(err.covariance), np.eye(2))
    # k < 0 -> zeros (truth.go:23-27).
    err3 = gt.error(bt, -1, est)
    np.testing.assert_allclose(np.asarray(err3.state), 0.0)


def test_error_all_batched():
    t = 5
    states = jnp.arange(t * 2, dtype=float).reshape(t, 2)
    bt = gt.BatchGroundTruth(states, None)
    ests = Estimate(
        states + 1.0,
        jnp.zeros((t, 1)),
        jnp.zeros((t, 1)),
        jnp.broadcast_to(jnp.eye(2), (t, 2, 2)),
        jnp.broadcast_to(jnp.eye(2), (t, 2, 2)),
        jnp.zeros((t, 2, 1)),
    )
    err = gt.error_all(bt, ests)
    np.testing.assert_allclose(np.asarray(err.state), 1.0)


def test_csv_exporter(tmp_path):
    e = new_csv_exporter(["x", "_t", "v"], str(tmp_path), "out.csv")
    est = _est([1.0, 7.0, 2.0], p=jnp.diag(jnp.array([4.0, 1.0, 9.0])))
    e.write(est)
    e.close()
    lines = (tmp_path / "out.csv").read_text().strip().split("\n")
    assert lines[0].startswith("# Creation date (UTC):")
    # `_t` header loses its bound columns (exporter.go:74-76) and the
    # data row must stay aligned with it (the Go reference misaligns:
    # its Write always emits three columns per component).
    assert lines[1] == "x,x+2s,x-2s,t,v,v+2s,v-2s"
    vals = lines[2].split(",")
    assert len(vals) == 7
    assert [float(v) for v in vals] == [1.0, 4.0, -4.0, 7.0, 2.0, 6.0, -6.0]
    assert lines[-1].startswith("# Closing date (UTC):")


def test_csv_round_trip(tmp_path):
    """write_all -> read_csv recovers the numeric content (the ingest
    path the reference's examples need for recorded inputs)."""
    from gokalman_tpu.exporter import read_csv

    t = 3
    ests = Estimate(
        jnp.arange(t * 2, dtype=float).reshape(t, 2),
        jnp.zeros((t, 1)),
        jnp.zeros((t, 1)),
        jnp.broadcast_to(jnp.eye(2), (t, 2, 2)),
        jnp.broadcast_to(jnp.eye(2), (t, 2, 2)),
        jnp.zeros((t, 2, 1)),
    )
    with CSVExporter(["a", "b"], str(tmp_path), "rt.csv", covar_bound=2.0) as e:
        e.write_all(ests)
    headers, data = read_csv(str(tmp_path / "rt.csv"))
    assert headers == ["a", "a+2s", "a-2s", "b", "b+2s", "b-2s"]
    assert data.shape == (t, 6)
    np.testing.assert_allclose(data[:, 0], np.arange(t) * 2.0)
    np.testing.assert_allclose(data[:, 3], np.arange(t) * 2.0 + 1.0)


def test_csv_write_all(tmp_path):
    t = 4
    ests = Estimate(
        jnp.ones((t, 2)),
        jnp.zeros((t, 1)),
        jnp.zeros((t, 1)),
        jnp.broadcast_to(jnp.eye(2), (t, 2, 2)),
        jnp.broadcast_to(jnp.eye(2), (t, 2, 2)),
        jnp.zeros((t, 2, 1)),
    )
    with CSVExporter(["a", "b"], str(tmp_path), "all.csv", covar_bound=3.0) as e:
        e.write_all(ests)
    lines = (tmp_path / "all.csv").read_text().strip().split("\n")
    data = [l for l in lines if not l.startswith("#") and not l[0].isalpha()]
    assert len(data) == t
    assert data[0] == "1.000000,3.000000,-3.000000,1.000000,3.000000,-3.000000"


def test_async_exporter_matches_sync(tmp_path):
    """AsyncCSVExporter must produce byte-identical files to the
    synchronous CSVExporter (modulo the timestamp comment lines), via
    both per-estimate write() and bulk write_all()."""
    import jax.numpy as jnp
    import numpy as np

    from gokalman_tpu import exporter
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import vanilla

    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    model, st = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                            gn.noiseless(0.01 * jnp.eye(2), jnp.eye(1)))
    ys = jnp.asarray(np.random.default_rng(8).standard_normal((40, 1)))
    _, ests = vanilla.run(model, st, measurements=ys)

    def body(path):
        return [l for l in open(path) if not l.startswith("#")]

    with exporter.CSVExporter(["x", "v"], tmp_path, "sync.csv", 2.0) as e:
        e.write_all(ests)
    with exporter.AsyncCSVExporter(["x", "v"], tmp_path, "bulk.csv", 2.0) as e:
        e.write_all(ests)
    with exporter.AsyncCSVExporter(["x", "v"], tmp_path, "rows.csv", 2.0) as e:
        for k in range(40):
            import jax

            e.write(jax.tree.map(lambda a: a[k], ests))
    assert body(tmp_path / "bulk.csv") == body(tmp_path / "sync.csv")
    assert body(tmp_path / "rows.csv") == body(tmp_path / "sync.csv")


def test_async_exporter_closed_raises(tmp_path):
    import pytest

    from gokalman_tpu import exporter

    e = exporter.AsyncCSVExporter(["x"], tmp_path, "c.csv", 2.0)
    e.close()
    with pytest.raises(RuntimeError):
        e.write_all(None)


def test_async_exporter_raw_writes_stay_ordered(tmp_path):
    """write_raw goes through the writer queue, so annotations land in
    submission order relative to queued estimate rows."""
    import jax.numpy as jnp
    import numpy as np

    from gokalman_tpu import exporter
    from gokalman_tpu import noise as gn
    from gokalman_tpu.filters import vanilla

    f = jnp.array([[1.0, 0.1], [0.0, 1.0]])
    h = jnp.array([[1.0, 0.0]])
    model, st = vanilla.new(jnp.zeros(2), jnp.eye(2), f, None, h,
                            gn.noiseless(0.01 * jnp.eye(2), jnp.eye(1)))
    ys = jnp.asarray(np.random.default_rng(0).standard_normal((200, 1)))
    _, ests = vanilla.run(model, st, measurements=ys)

    with exporter.AsyncCSVExporter(["x", "v"], tmp_path, "o.csv", 2.0) as e:
        e.write_all(ests)           # enqueue 200 rows
        e.write_raw_ln("#MARK")     # must land AFTER them
    lines = [l.strip() for l in open(tmp_path / "o.csv")
             if l.strip() and not l.startswith("# ")]
    assert lines[-1] == "#MARK", lines[-3:]
    assert len(lines) == 202  # header + 200 rows + marker


def test_async_exporter_surfaces_writer_errors(tmp_path):
    """An I/O failure in the writer thread surfaces as the original
    exception at the next API call or close(), never a silent loss."""
    import jax.numpy as jnp
    import numpy as np
    import pytest

    from gokalman_tpu import exporter

    e = exporter.AsyncCSVExporter(["x"], tmp_path, "err.csv", 2.0)
    e._fh.close()  # simulate the underlying stream dying
    import types

    est = types.SimpleNamespace(state=np.zeros(1), covariance=np.eye(1))
    e.write(est)  # enqueued; writer hits ValueError on closed file
    e._thread.join(timeout=10)
    with pytest.raises(ValueError):
        e.close()
