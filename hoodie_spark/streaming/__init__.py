from .ingest import (CsvDFSSource, OrcDFSSource, HoodieIncrSource, Ingestor, JdbcSource,
                     JsonDFSSource, KafkaSource, MultiTableIngestor,
                     ParquetDFSSource, SqlSource)
from .async_services import AsyncTableServices
from .incremental_dedup import IncrementalDeduper
from .index_maintainer import IvfIndexMaintainer
from .corpus_sketch import CorpusSketchMaintainer
from .drift import DriftMonitor
from .maintainer import ConcurrentMaintainerError, maintainer_lock
from .split_maintainer import SplitMaintainer
from .reservoir import ReservoirMaintainer
from .keep_best import KeepBestDeduper
from .line_census import LineCensusMaintainer
from .schema import (FileBasedSchemaProvider, RowBasedSchemaProvider,
                     SchemaProvider, SchemaRegistryProvider,
                     StaticSchemaProvider)
from .rollup import (continuous_aggregate, create_rollup_table,
                     windowed_rollup_frame)
from .sink import foreach_batch_writer, write_stream
from .stateful import stateful_dedup, stateful_session_counts
from .source import incremental_batches, latest_offset
from .transform import (AWSDmsTransformer, ChainedTransformer,
                        CorpusPipelineTransformer, DebeziumTransformer,
                        FlatteningTransformer, QualityGateTransformer,
                        SqlQueryTransformer, Transformer)

__all__ = ["foreach_batch_writer", "write_stream", "incremental_batches",
           "latest_offset", "Ingestor", "ParquetDFSSource", "JsonDFSSource",
           "CsvDFSSource", "OrcDFSSource", "JdbcSource", "KafkaSource", "SqlSource",
           "HoodieIncrSource", "MultiTableIngestor", "AsyncTableServices",
           "stateful_dedup", "stateful_session_counts", "IncrementalDeduper",
           "IvfIndexMaintainer", "CorpusSketchMaintainer",
           "SplitMaintainer", "ReservoirMaintainer", "KeepBestDeduper",
           "LineCensusMaintainer",
           "ConcurrentMaintainerError",
           "DriftMonitor",
           "SchemaProvider",
           "StaticSchemaProvider", "FileBasedSchemaProvider",
           "SchemaRegistryProvider", "RowBasedSchemaProvider",
           "Transformer", "SqlQueryTransformer", "FlatteningTransformer",
           "ChainedTransformer", "AWSDmsTransformer", "QualityGateTransformer",
           "DebeziumTransformer", "CorpusPipelineTransformer",
           "continuous_aggregate", "create_rollup_table",
           "windowed_rollup_frame"]
