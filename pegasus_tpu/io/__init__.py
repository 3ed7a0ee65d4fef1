from pegasus_tpu.io.colmap import (
    ColmapCamera,
    ColmapImage,
    read_cameras_binary,
    read_images_binary,
    read_points3d_binary,
    write_cameras_binary,
    write_images_binary,
    write_points3d_binary,
)
