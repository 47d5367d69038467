"""Model zoo: RNNPose and its subnetworks."""
from .rnnpose import RNNPose, RNNPoseConfig, RNNPoseInputs, CorrespondenceSet  # noqa: F401
from .rnnpose import register_posenet, get_posenet_class  # noqa: F401
from .refiner import PoseRefiner, RefinerConfig, MeshAssets, RefinerOutputs  # noqa: F401
from .kpconv_net import KPConvConfig, KPFCNN, PointPyramid  # noqa: F401
from .hybrid import HybridDescNet, ContextFeatureNet  # noqa: F401
from .superpoint import SuperPoint2D  # noqa: F401
from .engine import InferenceEngine  # noqa: F401
