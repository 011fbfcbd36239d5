"""Data layer: host-side ingest + device-ready batching.

See ``primia_tpu.data.datasets`` (decode/scan), ``.dicom`` (self-contained
DICOM parser), ``.loader`` (batching + dataset statistics).
"""

from primia_tpu.data.datasets import (  # noqa: F401
    CombinedLoader,
    Dataset,
    ImageFolderDataset,
    ImageFolderFromCSV,
    PPPP,
    PathDataset,
    Subset,
    pil_loader,
    random_split,
)
from primia_tpu.data.dicom import DicomLoader, load_dcm, read_dicom, write_dicom  # noqa: F401
from primia_tpu.data.loader import Batch, BatchLoader, calc_mean_std  # noqa: F401
