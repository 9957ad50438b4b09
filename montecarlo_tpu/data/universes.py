"""Ticker universes and the universe resolver (reference app.py:55-178).

The hardcoded fallback lists are the same public ticker sets the reference
ships; ``get_ticker_list`` tries live Wikipedia scraping first (app.py's
behavior) and falls back to these on any failure — including the fully
offline environments this framework targets.
"""

from __future__ import annotations

from typing import List

SP500_TICKERS = [
    "AAPL", "MSFT", "AMZN", "NVDA", "GOOGL", "META", "TSLA", "BRK-B", "UNH", "XOM",
    "JNJ", "JPM", "V", "PG", "MA", "HD", "CVX", "MRK", "ABBV", "LLY",
    "PEP", "KO", "AVGO", "COST", "MCD", "WMT", "CSCO", "TMO", "ACN", "ABT",
    "DHR", "BAC", "CRM", "CMCSA", "PFE", "ADBE", "NKE", "DIS", "VZ", "NFLX",
    "INTC", "WFC", "TXN", "PM", "NEE", "RTX", "BMY", "UNP", "QCOM", "UPS",
    "COP", "ORCL", "AMD", "MS", "HON", "LOW", "SPGI", "CAT", "IBM", "BA",
    "GS", "SBUX", "AMGN", "ELV", "DE", "INTU", "GE", "BLK", "AMAT", "GILD",
    "AXP", "PLD", "MDLZ", "LMT", "CVS", "ADI", "NOW", "TJX", "ISRG", "SYK",
    "REGN", "ADP", "VRTX", "BKNG", "MMC", "TMUS", "MO", "LRCX", "C", "ZTS",
    "CI", "SCHW", "CB", "ETN", "SO", "EOG", "BSX", "BDX", "DUK", "CME",
    "PGR", "NOC", "SLB", "MU", "ITW", "SNPS", "FI", "CL", "CSX", "CDNS",
    "HUM", "WM", "FCX", "AON", "ICE", "FDX", "MCK", "SHW", "ORLY", "MCO",
    "EMR", "GD", "PH", "KLAC", "PNC", "NXPI", "PSX", "TGT", "MAR", "NSC",
    "APD", "USB", "ROP", "AZO", "MSI", "CARR", "TDG", "PCAR", "AJG", "ECL",
    "OXY", "TT", "MCHP", "ADSK", "CTAS", "SRE", "MPC", "AEP", "CCI", "HCA",
    "FTNT", "TEL", "AFL", "TFC", "PAYX", "WELL", "KMB", "PSA", "DXCM", "GIS",
    "D", "VLO", "F", "MSCI", "MNST", "JCI", "AMP", "PEG", "A", "SPG",
    "KDP", "GM", "O", "CMG", "STZ", "NEM", "DHI", "HES", "ROST", "IDXX",
    "BIIB", "YUM", "CTSH", "DOW", "IQV", "ALL", "AIG", "LHX", "CHTR", "BK",
    "AME", "CPRT", "CMI", "EXC", "HAL", "KHC", "EA", "MRNA", "PRU", "OTIS",
]

NASDAQ100_TICKERS = [
    "AAPL", "MSFT", "AMZN", "NVDA", "GOOGL", "META", "TSLA", "AVGO", "COST", "ASML",
    "AMD", "ADBE", "NFLX", "PEP", "CSCO", "TMUS", "CMCSA", "INTC", "INTU", "AMGN",
    "TXN", "QCOM", "HON", "AMAT", "BKNG", "SBUX", "ISRG", "MDLZ", "ADP", "GILD",
    "VRTX", "ADI", "REGN", "PANW", "MU", "SNPS", "KLAC", "CDNS", "LRCX", "PYPL",
    "CSX", "MELI", "ORLY", "CRWD", "MAR", "CTAS", "MNST", "NXPI", "MCHP", "PCAR",
    "FTNT", "AEP", "KDP", "ADSK", "CPRT", "ROST", "DXCM", "AZN", "PAYX", "KHC",
    "IDXX", "CTSH", "CHTR", "MRNA", "EA", "BIIB", "ODFL", "EXC", "XEL", "GEHC",
    "ON", "CSGP", "FANG", "VRSK", "FAST", "DDOG", "ANSS", "ZS", "CDW", "TEAM",
    "GFS", "ILMN", "DLTR", "WBD", "BKR", "CEG", "ALGN", "ENPH", "WBA", "SIRI",
    "LCID", "JD", "PDD", "RIVN", "ZM", "ROKU", "COIN", "HOOD", "ABNB", "DASH",
]

POPULAR_TICKERS = [
    "AAPL", "MSFT", "GOOGL", "AMZN", "NVDA", "META", "TSLA",
    "AMD", "INTC", "AVGO", "QCOM", "TXN", "MU", "AMAT", "LRCX", "KLAC", "MRVL",
    "CRM", "ADBE", "NOW", "ORCL", "CSCO", "INTU", "PANW", "CRWD", "ZS", "SNOW",
    "JPM", "BAC", "WFC", "GS", "MS", "C", "BLK", "SCHW", "AXP", "V", "MA", "PYPL",
    "JNJ", "UNH", "PFE", "ABBV", "MRK", "LLY", "TMO", "ABT", "BMY", "AMGN", "GILD",
    "WMT", "COST", "HD", "LOW", "TGT", "NKE", "SBUX", "MCD", "KO", "PEP",
    "CAT", "DE", "HON", "UNP", "BA", "LMT", "RTX", "GE",
    "XOM", "CVX", "COP", "SLB", "EOG", "OXY",
    "SPY", "QQQ", "IWM", "DIA", "XLF", "XLK", "XLE", "XLV", "XLI", "XLP",
    "COIN", "SQ", "SHOP", "PLTR", "UBER", "ABNB", "RIVN", "LCID", "SOFI", "RBLX",
]

MEGA_CAP_TICKERS = [
    "AAPL", "MSFT", "GOOGL", "AMZN", "NVDA", "META", "TSLA", "BRK-B",
    "UNH", "XOM", "JNJ", "JPM", "V", "PG", "MA", "HD", "CVX", "LLY",
]

ETF_TICKERS = [
    "SPY", "QQQ", "IWM", "DIA", "XLF", "XLK", "XLE", "XLV", "XLI",
    "XLP", "XLY", "XLB", "XLU", "XLRE", "VOO", "VTI", "VEA", "VWO",
    "BND", "TLT", "GLD", "SLV", "USO", "VNQ", "ARKK", "ARKG", "ARKW",
    "SMH", "XBI", "KRE", "XRT", "ITB", "XHB", "JETS", "HACK",
]

#: The reference's source names (app.py:130-178).
SOURCES = ("S&P 500", "Nasdaq 100", "Popular Stocks", "Mega Caps Only",
           "ETFs Only", "All Combined")


def get_ticker_list(source: str, allow_network: bool = True) -> List[str]:
    """Resolve a universe name to tickers with the reference's fallbacks
    (app.py:127-178): live Wikipedia scrape when possible, hardcoded list on
    any failure, '.'->'-' symbol normalization, combined = dedup + sort."""
    if source == "S&P 500":
        if allow_network:
            try:
                import pandas as pd
                table = pd.read_html(
                    "https://en.wikipedia.org/wiki/List_of_S%26P_500_companies")
                tickers = (table[0]["Symbol"]
                           .str.replace(".", "-", regex=False).tolist())
                if len(tickers) > 400:
                    return tickers
            except Exception:
                pass
        return SP500_TICKERS

    if source == "Nasdaq 100":
        if allow_network:
            try:
                import pandas as pd
                table = pd.read_html("https://en.wikipedia.org/wiki/Nasdaq-100")
                for t in table:
                    for col in ("Ticker", "Symbol"):
                        if col in t.columns:
                            # Same '.'->'-' class-share normalization as
                            # the S&P branch (yfinance symbol convention).
                            tickers = [str(x).replace(".", "-")
                                       for x in t[col].tolist()]
                            if len(tickers) > 90:
                                return tickers
            except Exception:
                pass
        return NASDAQ100_TICKERS

    if source == "Popular Stocks":
        return POPULAR_TICKERS
    if source == "Mega Caps Only":
        return MEGA_CAP_TICKERS
    if source == "ETFs Only":
        return ETF_TICKERS
    if source == "All Combined":
        return sorted(set(SP500_TICKERS + NASDAQ100_TICKERS
                          + POPULAR_TICKERS + ETF_TICKERS))
    return POPULAR_TICKERS
