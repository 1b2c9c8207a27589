"""DimArray behaviour tests (selection, interp, arithmetic, pytree)."""

import jax
import numpy as np
import pytest

from xsarsea_tpu.dimarray import DimArray


def make_da():
    data = np.arange(24, dtype=np.float64).reshape(2, 3, 4)
    return DimArray(
        data,
        dims=("incidence", "wspd", "phi"),
        coords={"incidence": [20.0, 30.0], "wspd": [1.0, 2.0, 3.0],
                "phi": [0.0, 90.0, 180.0, 270.0]},
        attrs={"units": "linear"},
    )


def test_isel_and_sel():
    da = make_da()
    sub = da.isel(wspd=1)
    assert sub.dims == ("incidence", "phi")
    assert sub.shape == (2, 4)
    np.testing.assert_array_equal(sub.values, da.values[:, 1, :])

    sub2 = da.sel(incidence=30.0)
    np.testing.assert_array_equal(sub2.values, da.values[1])

    near = da.sel({"phi": 100.0}, method="nearest")
    np.testing.assert_array_equal(near.values, da.values[:, :, 1])


def test_interp_matches_scipy():
    from scipy.interpolate import interpn

    rng = np.random.default_rng(0)
    data = rng.normal(size=(5, 7, 9))
    coords = {
        "incidence": np.linspace(16, 66, 5),
        "wspd": np.linspace(0.2, 50, 7),
        "phi": np.linspace(0, 180, 9),
    }
    da = DimArray(data, dims=("incidence", "wspd", "phi"), coords=coords)

    new_inc = np.linspace(16, 66, 11)
    new_wspd = np.linspace(0.2, 50, 13)
    new_phi = np.linspace(0, 180, 17)
    got = da.interp(incidence=new_inc, wspd=new_wspd, phi=new_phi).values

    pts = np.stack(np.meshgrid(new_inc, new_wspd, new_phi, indexing="ij"), axis=-1)
    expected = interpn(tuple(coords.values()), data, pts, method="linear")
    np.testing.assert_allclose(got, expected, rtol=1e-12)


def test_sel_above_max_raises_keyerror():
    """sel beyond the coord maximum must raise KeyError, not IndexError
    (review finding: searchsorted returns len(coord) above the max)."""
    import pytest

    da = DimArray(np.arange(4.0), dims=("x",),
                  coords={"x": [0.0, 1.0, 2.0, 3.0]})
    with pytest.raises(KeyError):
        da.sel(x=100.0)
    with pytest.raises(KeyError):
        da.sel(x=1.5)  # between grid points: still KeyError
    assert float(np.asarray(da.sel(x=3.0).data)) == 3.0  # exact max works


def test_interp_identity_is_exact():
    """Interp onto the SAME coords returns the data bit-exactly — incl.
    values whose grid neighbor is NaN (the generic lerp would pollute an
    exact hit with 0*NaN). The StackedGradients alignment hits this path."""
    da = DimArray(np.array([1.0, np.nan, 3.0, 4.0]), dims=("x",),
                  coords={"x": [0.0, 1.0, 2.0, 3.0]})
    out = da.interp(x=np.array([0.0, 1.0, 2.0, 3.0]))
    np.testing.assert_array_equal(out.values, [1.0, np.nan, 3.0, 4.0])
    # 2-D: identity on one dim composes with real interp on the other
    d2 = DimArray(np.arange(12.0).reshape(3, 4), dims=("a", "b"),
                  coords={"a": [0.0, 1.0, 2.0], "b": [0.0, 1.0, 2.0, 3.0]})
    got = d2.interp(a=np.array([0.0, 1.0, 2.0]), b=np.array([0.5, 2.5]))
    np.testing.assert_allclose(
        got.values, np.arange(12.0).reshape(3, 4)[:, :2] * 0 +
        np.array([[0.5, 2.5], [4.5, 6.5], [8.5, 10.5]]))


def test_interp_out_of_bounds_nan():
    da = DimArray(np.arange(4.0), dims=("x",), coords={"x": [0.0, 1.0, 2.0, 3.0]})
    out = da.interp(x=[-1.0, 0.5, 4.0])
    assert np.isnan(out.values[0]) and np.isnan(out.values[2])
    assert out.values[1] == 0.5


def test_arithmetic_broadcast_by_name():
    a = DimArray(np.ones((2, 3)), dims=("line", "sample"))
    b = DimArray(np.arange(3.0), dims=("sample",))
    c = a + b
    assert c.dims == ("line", "sample")
    np.testing.assert_array_equal(c.values, np.ones((2, 3)) + np.arange(3.0))

    d = b * a
    assert d.shape == (3, 2) or d.shape == (2, 3)


def test_broadcast_like():
    big = DimArray(np.zeros((4, 5)), dims=("line", "sample"),
                   coords={"line": np.arange(4), "sample": np.arange(5)})
    row = DimArray(np.arange(5.0), dims=("sample",), coords={"sample": np.arange(5)})
    out = row.broadcast_like(big)
    assert out.shape == (4, 5)
    np.testing.assert_array_equal(out.values[2], np.arange(5.0))


def test_coarsen_trim():
    da = DimArray(np.arange(30.0).reshape(5, 6), dims=("line", "sample"),
                  coords={"line": np.arange(5.0), "sample": np.arange(6.0)})
    out = da.coarsen_mean({"line": 2, "sample": 2})
    assert out.shape == (2, 3)
    np.testing.assert_allclose(out.values[0, 0], np.mean([0, 1, 6, 7]))
    np.testing.assert_allclose(out.coords["line"], [0.5, 2.5])


def test_pytree_roundtrip_through_jit():
    da = make_da()

    @jax.jit
    def f(x: DimArray):
        return x.copy(data=x.data * 2.0)

    out = f(da)
    assert isinstance(out, DimArray)
    assert out.dims == da.dims
    np.testing.assert_array_equal(np.asarray(out.data), da.values * 2.0)
    np.testing.assert_array_equal(out.coords["phi"], da.coords["phi"])


def test_transpose_and_squeeze():
    da = make_da()
    t = da.transpose("wspd", "phi", "incidence")
    assert t.shape == (3, 4, 2)
    e = da.isel(incidence=slice(0, 1)).squeeze("incidence")
    assert e.dims == ("wspd", "phi")


def test_where_fillna():
    da = DimArray(np.array([1.0, np.nan, 3.0]), dims=("x",))
    np.testing.assert_array_equal(da.fillna(0.0).values, [1.0, 0.0, 3.0])
    masked = da.where(da > 2.0)
    assert np.isnan(masked.values[0])


def test_interp_descending_coord():
    """Descending coords must interpolate correctly (review finding:
    searchsorted without ordering gave garbage silently)."""
    c = np.array([30.0, 20.0, 10.0])
    da = DimArray(np.array([3.0, 2.0, 1.0]), dims=("x",), coords={"x": c})
    out = da.interp(x=np.array([25.0, 15.0]))
    np.testing.assert_allclose(out.values, [2.5, 1.5])
    # out-of-range still NaN
    out2 = da.interp(x=np.array([35.0, 5.0]))
    assert np.isnan(out2.values).all()


def test_interp_integer_data_promotes():
    """Integer data promotes to float (review finding: weights cast to
    int truncated to 0, silently returning nearest-left)."""
    da = DimArray(np.array([0, 10], dtype=np.int32), dims=("x",),
                  coords={"x": [0.0, 1.0]})
    out = da.interp(x=np.array([0.5]))
    assert np.issubdtype(out.values.dtype, np.floating)
    np.testing.assert_allclose(out.values, [5.0])
    oob = da.interp(x=np.array([2.0]))
    assert np.isnan(oob.values).all()


def test_elementwise_eq_ne():
    """== / != are elementwise like the other comparisons (review
    finding: fallback to identity returned scalar False)."""
    da = make_da()
    mask = da == 5.0
    assert isinstance(mask, DimArray)
    assert mask.values.sum() == 1
    ne = da != 5.0
    assert ne.values.sum() == da.values.size - 1


def test_where_aligns_transposed_mask():
    """A same-size transposed mask must be aligned by dim NAME, not
    applied positionally (review finding)."""
    data = np.arange(9, dtype=float).reshape(3, 3)
    da = DimArray(data, dims=("line", "sample"),
                  coords={"line": [0.0, 1.0, 2.0],
                          "sample": [0.0, 1.0, 2.0]})
    mask_t = DimArray((data.T > 4), dims=("sample", "line"),
                      coords={"sample": [0.0, 1.0, 2.0],
                              "line": [0.0, 1.0, 2.0]})
    out = da.where(mask_t, -1.0)
    np.testing.assert_array_equal(out.values, np.where(data > 4, data, -1.0))


def test_dataset_sel_raises_on_coordless_dim():
    """Label-selection on a variable that has the dim but no coordinate
    raises instead of silently skipping (review finding: inconsistent
    sizes along the dim)."""
    from xsarsea_tpu.dimarray import DimDataset

    a = DimArray(np.arange(3.0), dims=("line",), coords={"line": [0., 1., 2.]})
    b = DimArray(np.arange(3.0), dims=("line",), coords={})
    ds = DimDataset({"a": a, "b": b})
    with pytest.raises(KeyError, match="no coordinate"):
        ds.sel(line=1.0)


def test_dataset_concat_existing_dim():
    """concat along an existing dim concatenates (review finding: it
    silently stacked a duplicate dim name)."""
    from xsarsea_tpu.dimarray import DimDataset

    def mk(vals, coord):
        return DimDataset({"v": DimArray(np.asarray(vals, float),
                                         dims=("line",),
                                         coords={"line": coord})})

    out = DimDataset.concat([mk([1, 2], [0., 1.]), mk([3], [2.])], "line")
    assert out["v"].dims == ("line",)
    np.testing.assert_array_equal(out["v"].values, [1., 2., 3.])
    np.testing.assert_array_equal(np.asarray(out["v"].coords["line"]),
                                  [0., 1., 2.])
    # new dim still stacks
    out2 = DimDataset.concat([mk([1, 2], [0., 1.]), mk([3, 4], [0., 1.])],
                             "pol")
    assert out2["v"].dims == ("pol", "line")
