from .hashing import HASH64_SQL, hash64, hash64_sql
from .text import STOPWORDS, tokenize

__all__ = ["HASH64_SQL", "hash64", "hash64_sql", "STOPWORDS", "tokenize"]
