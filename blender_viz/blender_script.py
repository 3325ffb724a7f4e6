"""Batch Cycles renders of generated .obj meshes (Blender script).

Counterpart of reference ``blender_viz/blender_script.py`` (BlenderToolbox
driver: sun + ambient light, subdivision, floor snap, Cycles). This version
uses only bpy built-ins (no BlenderToolbox dependency). Run inside Blender:

    blender --background --python blender_viz/blender_script.py -- \
        --mesh_dir out/mesh --save_dir out/renders [--num_viz 8]

Untestable in this repo's environment (no Blender); kept API-compatible with
the reference's CLI flags.
"""

import argparse
import math
import os
import sys


def parse_args():
    argv = sys.argv[sys.argv.index('--') + 1:] if '--' in sys.argv else []
    p = argparse.ArgumentParser()
    p.add_argument('--mesh_dir', required=True)
    p.add_argument('--save_dir', required=True)
    p.add_argument('--num_viz', type=int, default=None)
    p.add_argument('--resolution', type=int, default=1024)
    p.add_argument('--samples', type=int, default=128)
    p.add_argument('--subdivision', type=int, default=1)
    return p.parse_args(argv)


def main():
    import bpy

    args = parse_args()
    os.makedirs(args.save_dir, exist_ok=True)

    meshes = sorted(f for f in os.listdir(args.mesh_dir)
                    if f.endswith('.obj'))
    if args.num_viz:
        meshes = meshes[:args.num_viz]

    scene = bpy.context.scene
    scene.render.engine = 'CYCLES'
    scene.cycles.samples = args.samples
    scene.render.resolution_x = args.resolution
    scene.render.resolution_y = args.resolution
    scene.render.film_transparent = True

    # sun + ambient (reference blender_script.py lighting setup)
    bpy.ops.object.light_add(type='SUN', location=(2, 2, 4))
    sun = bpy.context.object
    sun.data.energy = 3.0
    sun.rotation_euler = (math.radians(35), math.radians(-20), 0)
    scene.world.use_nodes = True
    bg = scene.world.node_tree.nodes['Background']
    bg.inputs[1].default_value = 0.6  # ambient strength

    bpy.ops.object.camera_add(location=(0, -2.6, 1.2),
                              rotation=(math.radians(65), 0, 0))
    scene.camera = bpy.context.object

    # floor
    bpy.ops.mesh.primitive_plane_add(size=20, location=(0, 0, -1.0))

    for name in meshes:
        path = os.path.join(args.mesh_dir, name)
        bpy.ops.wm.obj_import(filepath=path)
        obj = bpy.context.selected_objects[0]

        # floor snap: move min-z to the floor plane
        zmin = min((obj.matrix_world @ v.co).z for v in obj.data.vertices)
        obj.location.z -= (zmin + 1.0)

        if args.subdivision > 0:
            mod = obj.modifiers.new('subdiv', 'SUBSURF')
            mod.levels = args.subdivision
            mod.render_levels = args.subdivision

        mat = bpy.data.materials.new('meshmat')
        mat.use_nodes = True
        bsdf = mat.node_tree.nodes['Principled BSDF']
        bsdf.inputs['Base Color'].default_value = (0.75, 0.3, 0.6, 1.0)
        bsdf.inputs['Roughness'].default_value = 0.8
        obj.data.materials.append(mat)

        scene.render.filepath = os.path.join(
            args.save_dir, os.path.splitext(name)[0] + '.png')
        bpy.ops.render.render(write_still=True)
        bpy.data.objects.remove(obj, do_unlink=True)


if __name__ == '__main__':
    main()
