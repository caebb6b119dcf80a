from .sharded import ShardedRenderer, halo_exchange_rows, make_row_mesh  # noqa: F401
