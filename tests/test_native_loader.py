"""Native C++ CSV loader vs pandas, and the csv provider path."""

import numpy as np
import pandas as pd
import pytest

from montecarlo_tpu.data._native import get_lib, load_ohlcv_csv
from montecarlo_tpu.data.fetch import get_stock_data
from montecarlo_tpu.data.synthetic import generate_ohlcv


@pytest.fixture(scope="module")
def csv_file(tmp_path_factory):
    d = tmp_path_factory.mktemp("csv")
    ohlcv = generate_ohlcv(n_days=600, seed=9)
    df = pd.DataFrame({"Date": np.arange(600), **ohlcv})
    path = d / "TEST.csv"
    df.to_csv(path, index=False)
    return str(path), ohlcv


def test_native_toolchain_builds():
    assert get_lib() is not None, "g++ toolchain expected in this image"


def test_native_matches_pandas(csv_file):
    path, ohlcv = csv_file
    native = load_ohlcv_csv(path)
    assert native is not None
    ref = pd.read_csv(path)
    for col in ("Open", "High", "Low", "Close", "Volume"):
        np.testing.assert_allclose(native[col], ref[col].to_numpy(),
                                   rtol=1e-15, err_msg=col)


def test_native_rejects_missing_columns(tmp_path):
    bad = tmp_path / "bad.csv"
    bad.write_text("a,b,c\n1,2,3\n")
    assert load_ohlcv_csv(str(bad)) is None


def test_native_missing_file():
    assert load_ohlcv_csv("/nonexistent/file.csv") is None


def test_csv_provider_end_to_end(csv_file):
    path, _ = csv_file
    import os
    data = get_stock_data("TEST", provider="csv",
                          data_dir=os.path.dirname(path))
    assert data is not None
    assert "rvol_20" in data and len(data["Close"]) > 300
