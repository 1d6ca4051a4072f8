"""Quant screening showcase — the r04 tier-2 additions composed into
the daily screen a systematic desk runs:

1. daily candles + pattern flags (functions/candles.py)
2. tier-2 indicators: Keltner squeeze + CCI + Williams %R
   (functions/technical2.py)
3. risk stats: rolling Sharpe, beta, drawdown duration
   (functions/rollstats2.py)
4. cross-sectional ranking: revenue deciles + latest-state snapshot
   (plans/analytics2.py)

Run: python examples/quant_screen_demo.py [sf_dir]
"""

import sys
sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from datafusion_functions_financial_spark.functions import (
    candles,
    rollstats2,
    technical2,
)
from datafusion_functions_financial_spark.plans import analytics2
from datafusion_functions_financial_spark.sources.tables import load


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("quant-screen-demo")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")

    print("=== 1. Daily candles + patterns (events as tick stream) ===")
    bars = candles.candle_patterns(events)
    flagged = bars.filter("is_doji OR is_hammer OR is_bull_engulf")
    print(f"bars: {bars.count()}, pattern-flagged: {flagged.count()}")
    flagged.orderBy("user_id", "day").show(5)

    print("=== 2. Tier-2 indicators on the tick series ===")
    keyed = (["user_id"], ["ts", "event_id"])
    ind = technical2.keltner(events, "value", *keyed, n=5)
    ind = technical2.cci(ind, "value", *keyed, n=5)
    ind = technical2.williams_r(ind, "value", *keyed, n=5)
    squeeze = ind.filter(
        "kc_hi IS NOT NULL AND cci IS NOT NULL "
        "AND value > kc_hi AND cci > 100"
    )
    print(f"breakout candidates (above Keltner, CCI>100): "
          f"{squeeze.count()}")

    print("=== 3. Risk stats on the orders series ===")
    okeys = (["o_custkey"], ["o_orderdate", "o_orderkey"])
    risk = rollstats2.rolling_sharpe(orders, "o_totalprice", *okeys, n=5)
    risk = rollstats2.time_since_high(risk, "o_totalprice", *okeys)
    risk.select("o_custkey", "o_orderkey", "sharpe",
                "bars_since_high").orderBy(
        F.col("sharpe").desc_nulls_last()).show(5)

    print("=== 4. Cross-sectional snapshot + deciles ===")
    snap = analytics2.latest_order_per_customer(orders)
    dec = analytics2.customer_deciles(orders)
    screen = (
        snap.join(dec, "o_custkey")
        .filter("decile <= 2")
        .orderBy("decile", F.col("revenue").desc())
    )
    print(f"top-quintile customers: {screen.count()}")
    screen.show(5)

    print("=== 5. Tier-3 trend/tail-risk overlay (late-r04 surface) ===")
    from datafusion_functions_financial_spark.functions import (
        risk as riskmod,
        technical3,
    )
    from datafusion_functions_financial_spark.plans import portfolio

    trend = technical3.adx(events, "value", *keyed, n=5)
    strong = trend.filter("adx IS NOT NULL AND adx > 50")
    print(f"strong-trend ticks (ADX>50): {strong.count()}")
    tail = riskmod.rolling_var_cvar(events, "value", *keyed, n=10)
    tail.filter("cvar IS NOT NULL").orderBy(
        F.col("cvar").desc()).select(
        "user_id", "event_id", "var", "cvar").show(3)

    weights = {0: 4000, 1: 2500, 2: 1500, 3: 1200, 4: 800}
    betas = portfolio.market_beta(events, weights)
    print("market beta extremes:")
    betas.filter("beta IS NOT NULL").orderBy(
        F.col("beta").desc()).show(3)

    spark.stop()


if __name__ == "__main__":
    main()
