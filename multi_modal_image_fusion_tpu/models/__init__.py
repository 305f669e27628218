from .zoo import (MODEL_ZOO, DBNet, DeepFuse, DenseFuse, DIFNet, IFCNN,
                  MAFusion, MyFusion, NestFuse, PFNetv1, PFNetv2, PMGI,
                  Res2Fusion, RFNNest, SEDRFuse, UNFusion, VIFNet,
                  create_model)

__all__ = [
    "PFNetv1", "PFNetv2", "DeepFuse", "DenseFuse", "VIFNet", "DBNet",
    "SEDRFuse", "NestFuse", "RFNNest", "UNFusion", "Res2Fusion", "MAFusion",
    "IFCNN", "DIFNet", "PMGI", "MyFusion", "MODEL_ZOO", "create_model",
]
