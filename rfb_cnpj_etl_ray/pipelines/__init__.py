from rfb_cnpj_etl_ray.pipelines.ingest import (
    ingest,
    init_lake_distributed,
    read_lake,
)

__all__ = ["ingest", "init_lake_distributed", "read_lake"]
