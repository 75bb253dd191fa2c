from aquery2_tpu.storage.table import Column, StringDict, Table, VectorColumn
from aquery2_tpu.storage.result import Result
from aquery2_tpu.storage.catalog import Catalog

__all__ = ["Column", "StringDict", "Table", "VectorColumn", "Result", "Catalog"]
