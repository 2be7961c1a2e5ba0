from ramdsir_tpu.data.fundus import FundusDataset, FundusMultiDataset  # noqa: F401
from ramdsir_tpu.data.prostate import ProstateDataset, ProstateMultiDataset  # noqa: F401
from ramdsir_tpu.data.loaders import DataLoader, MultiDomainIterator  # noqa: F401
