"""Dense multi-view stereo: the TPU-native openMVS replacement.

The reference delegates densification/meshing to the external openMVS C++
library (ref: src/photogrammetrie/mvs/MVS.cpp:112-181); here the dense math
is first-class: plane-sweep depth maps (default), Pallas SGM cost-volume
aggregation (--sgm), multi-view consistency fusion, TSDF meshing.
"""
