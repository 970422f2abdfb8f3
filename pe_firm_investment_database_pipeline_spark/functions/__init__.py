from .exact import cents, cents_sum_money, pct, qty_int

__all__ = ["cents", "pct", "qty_int", "cents_sum_money"]
