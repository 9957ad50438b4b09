"""End-to-end API: analyze pipeline, scanner, data layer, universes."""

import numpy as np

from montecarlo_tpu.api import analyze_ticker, scan_tickers
from montecarlo_tpu.config import ModelConfig
from montecarlo_tpu.data import get_stock_data, get_ticker_list


def test_get_ticker_list_offline_fallbacks():
    for source, min_len in [("S&P 500", 150), ("Nasdaq 100", 90),
                            ("Popular Stocks", 50), ("Mega Caps Only", 10),
                            ("ETFs Only", 20)]:
        tickers = get_ticker_list(source, allow_network=False)
        assert len(tickers) >= min_len, source
    combined = get_ticker_list("All Combined", allow_network=False)
    assert combined == sorted(set(combined))
    assert get_ticker_list("bogus") == get_ticker_list("Popular Stocks")


def test_get_stock_data_synthetic_contract():
    data = get_stock_data("AAPL", "3y", provider="synthetic")
    assert data is not None
    assert "rvol_20" in data and "log_ret" in data and "Close" in data
    assert len(data["Close"]) > 400
    # Deterministic per ticker; distinct across tickers.
    again = get_stock_data("AAPL", "3y", provider="synthetic")
    np.testing.assert_array_equal(data["Close"], again["Close"])
    other = get_stock_data("MSFT", "3y", provider="synthetic")
    assert not np.array_equal(data["Close"], other["Close"])


def test_get_stock_data_short_period_returns_none():
    # 1y -> 252 rows; the ~200-row feature warmup leaves < MIN_ROWS... the
    # guard fires before featurization for < 200 raw rows, after for short
    # feature output. Either way the reference contract is None or valid.
    data = get_stock_data("TSLA", "1y", provider="synthetic")
    assert data is None or len(data["Close"]) > 0


def test_analyze_ticker_end_to_end():
    out = analyze_ticker(
        "NVDA", forecast_horizon=20, n_sims=500, run_backtest=True,
        period="5y", model_config=ModelConfig.fast(), provider="synthetic")
    assert out is not None
    assert out["results"]["signal"] in (-1, 0, 1)
    assert out["mc_results"] is not None
    assert out["mc_results"]["paths"].shape == (21, 500)
    assert out["backtest_results"] is not None
    assert out["backtest_results"]["metrics"]["trading_days"] > 0


def test_scanner_end_to_end_and_summary():
    tickers = ["AAPL", "MSFT", "GOOGL", "AMZN"]
    progress = []
    res = scan_tickers(
        tickers, forecast_horizon=20, config=ModelConfig.fast(),
        period="3y", provider="synthetic", parallel=True, n_workers=2,
        progress_callback=lambda done, total, out: progress.append(done))
    assert len(res.results) + len(res.failed) == len(tickers)
    assert progress[-1] == len(tickers)
    for r in res.results:
        assert set(r) == {"Ticker", "Price", "Dir. Accuracy", "Pred. Return",
                          "Volatility", "Signal", "Edge", "Confidence"}
        assert r["Signal"] in ("LONG", "SHORT", "FLAT")
    s = res.summary(len(tickers), min_accuracy=52.0)
    assert s["attempted"] == 4
    assert s["successful"] == len(res.results)
    assert s["with_edge"] == len(res.edge_stocks(52.0))


def test_scanner_failure_taxonomy():
    res = scan_tickers(["AAPL"], config=ModelConfig.full(), period="1y",
                       provider="synthetic", parallel=False)
    # 1y of synthetic data is always too short for the full preset.
    assert len(res.failed) == 1
    s = res.summary(1, 52.0)
    assert sum(s["failure_reasons"].values()) == 1


def test_batched_scanner_matches_threaded():
    """The vmapped batch scanner agrees with the threaded scanner."""
    from montecarlo_tpu.api import scan_tickers_batched

    tickers = ["AAPL", "MSFT", "GOOGL", "AMZN", "NVDA"]
    cfg = ModelConfig.fast()
    threaded = scan_tickers(tickers, forecast_horizon=20, config=cfg,
                            period="3y", provider="synthetic",
                            parallel=False)
    progress = []
    batched = scan_tickers_batched(
        tickers, forecast_horizon=20, config=cfg, period="3y",
        provider="synthetic",
        progress_callback=lambda d, t, o: progress.append(d))
    assert len(batched.results) == len(threaded.results)
    assert progress[-1] == len(tickers)
    by_name = {r["Ticker"]: r for r in batched.results}
    for r in threaded.results:
        b = by_name[r["Ticker"]]
        # f32 on-device features vs f64: accuracies match closely.
        assert abs(b["Dir. Accuracy"] - r["Dir. Accuracy"]) < 3.0, r["Ticker"]
        assert abs(b["Price"] - r["Price"]) < 0.01 * r["Price"]


def test_batched_scanner_chunking_invariant():
    """device_batch chunking (incl. a padded tail) changes NO record: every
    fit is keyed by (seed, tree index), never by batch position, and padded
    rows are discarded (batch_scan._padded_chunks)."""
    from montecarlo_tpu.api import scan_tickers_batched

    tickers = ["AAPL", "MSFT", "GOOGL", "AMZN", "NVDA"]
    cfg = ModelConfig.fast()
    one = scan_tickers_batched(tickers, config=cfg, period="3y",
                               provider="synthetic", device_batch=50)
    # 5 tickers in chunks of 2 -> padded tail chunk exercised.
    chunked = scan_tickers_batched(tickers, config=cfg, period="3y",
                                   provider="synthetic", device_batch=2)
    assert len(one.results) == len(chunked.results) == len(tickers)
    by_name = {r["Ticker"]: r for r in chunked.results}
    for r in one.results:
        assert by_name[r["Ticker"]] == r  # bitwise: same floats throughout


def test_batched_scanner_failure_records():
    from montecarlo_tpu.api import scan_tickers_batched

    res = scan_tickers_batched(["AAPL", "MSFT"], config=ModelConfig.full(),
                               period="1y", provider="synthetic")
    assert len(res.failed) == 2  # too short for the full preset
    assert all("Insufficient" in f["Reason"] or "No data" in f["Reason"]
               for f in res.failed)


def test_scanner_per_ticker_timeout(monkeypatch):
    """One stuck ticker times out while others (still completing) finish —
    a global stall window would never trip here because completions keep
    resetting it (round-1 weak spot; reference app.py:1399 semantics)."""
    import time as _time

    import montecarlo_tpu.api.scanner as scanner_mod

    def fake_scan(ticker, **kw):
        if ticker == "STUCK":
            _time.sleep(8.0)  # far past the 1.5 s deadline
        else:
            _time.sleep(0.3)  # alive and completing — resets a stall window
        return {"success": True, "ticker": ticker, "data": {
            "Ticker": ticker, "Price": 100.0, "Dir. Accuracy": 55.0,
            "Pred. Return": 1.0, "Volatility": 20.0, "Signal": "LONG",
            "Edge": True, "Confidence": 50.0}}

    monkeypatch.setattr(scanner_mod, "scan_single_ticker", fake_scan)
    t0 = _time.monotonic()
    res = scanner_mod.scan_tickers(
        ["SYN_A", "STUCK", "SYN_B", "SYN_C", "SYN_D", "SYN_E"],
        forecast_horizon=20, config=ModelConfig.fast(), period="2y",
        provider="synthetic", parallel=True, n_workers=2, timeout=1.5)
    elapsed = _time.monotonic() - t0
    failed = {f["Ticker"]: f["Reason"] for f in res.failed}
    assert failed.get("STUCK") == "Timeout"
    done = {r["Ticker"] for r in res.results}
    assert {"SYN_A", "SYN_B", "SYN_C", "SYN_D", "SYN_E"} <= done
    # The scan returns as soon as the deadline trips — it must not wait out
    # the stuck worker's full 8 s sleep.
    assert elapsed < 7.5, elapsed


def test_scanner_terminates_when_pool_is_wedged(monkeypatch):
    """All workers stuck on hung tasks: queued tickers can never start, so
    the liveness guard must drain them as timeouts instead of spinning
    forever (code-review finding: the per-ticker deadline alone deadlocks
    here because queued futures never get a start time)."""
    import time as _time

    import montecarlo_tpu.api.scanner as scanner_mod

    def hung_scan(ticker, **kw):
        _time.sleep(60.0)  # far beyond the test's patience
        return {"ticker": ticker, "success": False, "error": "late"}

    monkeypatch.setattr(scanner_mod, "scan_single_ticker", hung_scan)
    t0 = _time.monotonic()
    res = scanner_mod.scan_tickers(
        ["A", "B", "C", "D"], config=ModelConfig.fast(), period="2y",
        provider="synthetic", parallel=True, n_workers=2, timeout=1.5)
    elapsed = _time.monotonic() - t0
    assert elapsed < 15.0, elapsed
    failed = {f["Ticker"] for f in res.failed}
    assert failed == {"A", "B", "C", "D"}
    assert all(f["Reason"] == "Timeout" for f in res.failed)


def test_scanner_duplicate_tickers_have_independent_deadlines(monkeypatch):
    """Duplicate tickers must not share a timeout clock (deadlines are
    keyed per submission, not per ticker string)."""
    import time as _time

    import montecarlo_tpu.api.scanner as scanner_mod

    def ok_scan(ticker, **kw):
        _time.sleep(0.8)
        return {"success": True, "ticker": ticker, "data": {
            "Ticker": ticker, "Price": 1.0, "Dir. Accuracy": 55.0,
            "Pred. Return": 0.0, "Volatility": 1.0, "Signal": "FLAT",
            "Edge": False, "Confidence": 0.0}}

    monkeypatch.setattr(scanner_mod, "scan_single_ticker", ok_scan)
    # n_workers=1: the second DUP is queued while the first runs.  With
    # ticker-keyed clocks the queued copy inherits the first's start time
    # and gets falsely expired (timeout < 2 * task time).
    res = scanner_mod.scan_tickers(
        ["DUP", "DUP", "DUP"], config=ModelConfig.fast(), period="2y",
        provider="synthetic", parallel=True, n_workers=1, timeout=1.2)
    assert len(res.results) == 3, (res.results, res.failed)
    assert not res.failed


def test_garch_mc_antithetic_tightens_bands():
    """antithetic=True must stay unbiased (bands agree within noise) and
    reduce the estimator variance of the expected return."""
    from montecarlo_tpu.api import garch_monte_carlo

    data = get_stock_data("AAPL", "3y", provider="synthetic")
    s0 = float(np.asarray(data["Close"])[-1])
    plain = [garch_monte_carlo(data, 2000, 20, s0, seed=s)["expected_return"]
             for s in range(10)]
    anti = [garch_monte_carlo(data, 2000, 20, s0, seed=s,
                              antithetic=True)["expected_return"]
            for s in range(10)]
    se = np.std(plain, ddof=1) / np.sqrt(10) + np.std(anti, ddof=1) / np.sqrt(10)
    assert abs(np.mean(plain) - np.mean(anti)) < 6 * se + 0.05
    assert np.std(anti, ddof=1) < np.std(plain, ddof=1)
