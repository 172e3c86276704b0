from coolchic_tpu.eval.bd_rate import (
    avg_bd_rate_vs_anchor,
    bd_psnr,
    bd_rate,
    bd_rate_vs_anchor,
    parse_result_summary,
    write_results_tsv,
)

__all__ = [
    "avg_bd_rate_vs_anchor",
    "bd_psnr",
    "bd_rate",
    "bd_rate_vs_anchor",
    "parse_result_summary",
    "write_results_tsv",
]
