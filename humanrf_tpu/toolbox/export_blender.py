#!/usr/bin/env python3
"""Blender scene exporter: build a .blend with all calibrated cameras,
optional background images and the person mesh.

Capability mirror of `/root/reference/actorshq/toolbox/export_blender.py` (same
CLI shape; runs inside Blender):

    blender --background --python export_blender.py -- \
        --data_folder <scale_dir> --frame_number 0 --output_blend out.blend

Landscape and portrait cameras go into separate scenes (they have different
render resolutions); each camera becomes a pinhole camera with principal-point
shift, plus a per-camera render view. bpy is only available inside Blender, so
this module exits with instructions when imported elsewhere.
"""

try:
    import bpy
except ModuleNotFoundError:
    import sys

    print(
        "This program needs to be executed through blender like this:\n"
        "```\nblender --background --python export_blender.py -- "
        "--data_folder /path/to/1x --frame_number 0 --output_blend /tmp/cameras.blend\n```"
    )
    sys.exit(0)

import argparse
import sys
from pathlib import Path

import numpy as np
from mathutils import Matrix

sys.path.append(str(Path(__file__).resolve().parent.parent.parent))
from humanrf_tpu.core.camera import CameraData, read_calibration_csv  # noqa: E402
from humanrf_tpu.core.dataset import VolumetricDataset  # noqa: E402

# Blender cameras look down -Z with +Y up; our RDF cameras look down +Z with
# +Y down → rotate 180° about X to convert.
_RDF_TO_BLENDER = np.diag([1.0, -1.0, -1.0])


def _make_camera(camera: CameraData, collection):
    cam_data = bpy.data.cameras.new(f"data_{camera.name}")
    cam_data.sensor_fit = "HORIZONTAL"
    cam_data.type = "PERSP"
    cam_data.lens_unit = "FOV"
    cam_data.angle = 2.0 * np.arctan2(0.5 * camera.width, camera.fx_pixel)
    # Principal-point shift in sensor-relative units.
    cam_data.shift_x = -(camera.principal_point[0] - 0.5)
    cam_data.shift_y = (camera.principal_point[1] - 0.5) * camera.height / camera.width

    cam_obj = bpy.data.objects.new(camera.name, cam_data)
    matrix = np.eye(4)
    matrix[:3, :3] = camera.rotation_matrix_cam2world() @ _RDF_TO_BLENDER
    matrix[:3, 3] = camera.translation
    cam_obj.matrix_world = Matrix(matrix.tolist())
    collection.objects.link(cam_obj)
    return cam_obj


def _add_render_view(scene, camera: CameraData):
    if f"renderview_{camera.name}" not in scene.render.views:
        view = scene.render.views.new(f"renderview_{camera.name}")
        view.camera_suffix = f"_{camera.name}"


def _scene_for(orientation: str, width: int, height: int):
    name = f"scene_{orientation}"
    if name in bpy.data.scenes:
        return bpy.data.scenes[name]
    scene = bpy.data.scenes.new(name)
    scene.render.resolution_x = width
    scene.render.resolution_y = height
    scene.render.views_format = "MULTIVIEW"
    return scene


def main():
    argv = sys.argv[sys.argv.index("--") + 1 :] if "--" in sys.argv else []
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_folder", type=Path, required=True)
    parser.add_argument("--frame_number", type=int, default=None)
    parser.add_argument("--mesh", type=Path, default=None, help="Optional .obj/.abc person mesh")
    parser.add_argument("--output_blend", type=Path, required=True)
    parser.add_argument("--with_background_images", action="store_true")
    args = parser.parse_args(argv)

    dataset = VolumetricDataset(args.data_folder)
    cameras = dataset.cameras

    # Fresh file.
    bpy.ops.wm.read_factory_settings(use_empty=True)

    collection = bpy.data.collections.new("actorshq_cameras")
    for orientation in ("landscape", "portrait"):
        cams = [c for c in cameras if (c.width > c.height) == (orientation == "landscape")]
        if not cams:
            continue
        scene = _scene_for(orientation, cams[0].width, cams[0].height)
        if collection.name not in scene.collection.children:
            scene.collection.children.link(collection)
        for camera in cams:
            cam_obj = _make_camera(camera, collection)
            _add_render_view(scene, camera)
            if args.with_background_images and args.frame_number is not None:
                rgb_path = dataset.filepaths.get_rgb_path(camera.name, args.frame_number)
                if rgb_path.exists():
                    img = bpy.data.images.load(str(rgb_path))
                    bg = cam_obj.data.background_images.new()
                    bg.image = img
                    cam_obj.data.show_background_images = True

    if args.mesh is not None:
        suffix = args.mesh.suffix.lower()
        if suffix == ".obj":
            bpy.ops.wm.obj_import(filepath=str(args.mesh))
        elif suffix == ".abc":
            bpy.ops.wm.alembic_import(filepath=str(args.mesh))
        else:
            raise RuntimeError(f"Unsupported mesh format: {suffix}")

    args.output_blend.parent.mkdir(parents=True, exist_ok=True)
    bpy.ops.wm.save_as_mainfile(filepath=str(args.output_blend))
    print(f"Wrote {args.output_blend}")


if __name__ == "__main__":
    main()
