from tpu_unsup_pc.models.encoder import ImageEncoder  # noqa: F401
from tpu_unsup_pc.models.decoder import PointDecoder  # noqa: F401
from tpu_unsup_pc.models.pose import PoseHead  # noqa: F401
from tpu_unsup_pc.models.model import DPCModel, ModelOutput  # noqa: F401
