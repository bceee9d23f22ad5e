from .skew import hot_keys_df, salted_join

__all__ = ["hot_keys_df", "salted_join"]
