from .hashing import md5_long, md5_long_sql
from .money import dec, dec_sql, dsum, dsum_sql
from .text import WS_RE

__all__ = ["md5_long", "md5_long_sql", "dec", "dec_sql", "dsum", "dsum_sql",
           "WS_RE"]
