"""Terminal EDA walkthrough: the reference's exploratory loop
(describe → summarize → frequencies → plots) over lineitem, every
step reducing in Spark and rendering driver-side.

Run: python examples/eda.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataframe_spark as D
from dataframe_spark import display as disp
from dataframe_spark.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = D.get_spark("eda")
    spark.sparkContext.setLogLevel("ERROR")
    li = D.DataFrame(load_table(spark, sf_dir, "lineitem"))

    print("== head ==")
    print(disp.to_string(li, 5), "\n")

    print("== summarize ==")
    print(disp.to_markdown(li.summarize(), 10), "\n")

    print("== value frequencies: l_returnflag ==")
    print(disp.plot_bars(li, "l_returnflag"), "\n")

    print("== histogram: l_extendedprice ==")
    print(disp.plot_histogram(li, "l_extendedprice", bins=12), "\n")

    print("== box plots ==")
    print(disp.plot_box_plots(li, ["l_quantity", "l_discount", "l_tax"]), "\n")

    print("== price vs quantity density ==")
    print(disp.plot_scatter(li, "l_quantity", "l_extendedprice", 50, 12), "\n")

    print("== correlation matrix ==")
    print(
        disp.plot_correlation_matrix(
            li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
        )
    )


if __name__ == "__main__":
    main()
