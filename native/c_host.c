/* FFI usage example: drives the C ABI exactly like the reference's
 * examples/c_raytracer.rs:48-62 — build a NUL-terminated world source
 * (including the two triangles, :42-43), load_world -> render -> write PPM
 * at 200x200.
 */

#include <stdio.h>
#include <stdlib.h>

#include "raytracer_tpu.h"

static const char *WORLD_SOURCE =
    "camera origin 0.0 0.0 0.0 aspect 1.77778;\n"
    "\n"
    "material RED_DIFFUSE     : Diffuse color 1.0 0.0 0.0;\n"
    "material GREEN_DIFFUSE   : Diffuse color 0.0 1.0 0.0;\n"
    "material BLUE_DIFFUSE    : Diffuse color 0.0 0.0 1.0;\n"
    "material GROUND_MATERIAL : Diffuse color 0.8 0.8 0.0;\n"
    "material BALL_MATERIAL   : Diffuse color 0.7 0.3 0.3;\n"
    "\n"
    "material METAL_MATERIAL_1 : Metal color 0.8 0.8 0.8 fuzz 0.3;\n"
    "material METAL_MATERIAL_2 : Metal color 0.8 0.6 0.2 fuzz 1.0;\n"
    "\n"
    "material MIRROR : Metal color 0.9 0.9 0.9 fuzz 0.0;\n"
    "material GLASS  : Dielectric ir 1.5;\n"
    "\n"
    "sphere center  0.0 -100.5 -1.0  radius 100.0 material GROUND_MATERIAL;\n"
    "\n"
    "sphere center  0.0  0.0  -1.0  radius 0.5   material BALL_MATERIAL;\n"
    "sphere center -1.0  0.0  -1.0  radius 0.5   material METAL_MATERIAL_1;\n"
    "sphere center  1.0  0.0  -1.0  radius 0.5   material GLASS;\n"
    "\n"
    "sphere center  0.0  1.0  -2.0  radius 0.5   material MIRROR;\n"
    "\n"
    "sphere center -3.0  2.0  -3.0  radius 0.5   material RED_DIFFUSE;\n"
    "sphere center  0.0  2.0  -3.0  radius 0.5   material GREEN_DIFFUSE;\n"
    "sphere center  3.0  2.0  -3.0  radius 0.5   material BLUE_DIFFUSE;\n"
    "\n"
    "triangle v0 -0.1 -0.1 -0.5  v1 0.1 -0.1 -0.5  v2 -0.1 0.1 -0.5  "
    "material RED_DIFFUSE;\n"
    "triangle v0 -0.1  0.1 -0.5  v1 0.1 -0.1 -0.5  v2  0.1 0.1 -0.5  "
    "material GREEN_DIFFUSE;\n";

int main(void) {
  const size_t width = 200, height = 200;

  RtWorldHandle *world = rt_load_world(WORLD_SOURCE);
  if (!world) {
    fprintf(stderr, "load_world failed: %s\n", rt_last_error());
    return 1;
  }

  RtColorU8 *pixels = malloc(width * height * sizeof(RtColorU8));
  RtFramebuffer fb = {width, height, pixels};

  /* NULL options = the reference FFI defaults: 16 spp, 8 bounces
   * (lib.rs:51), parity mode */
  if (rt_render(fb, world, NULL) != 0) {
    fprintf(stderr, "render failed: %s\n", rt_last_error());
    return 1;
  }

  if (rt_write_ppm(&fb, "native_image.ppm") != 0) {
    fprintf(stderr, "write failed: %s\n", rt_last_error());
    return 1;
  }
  printf("wrote native_image.ppm (%s)\n", rt_version());

  /* interactive-loop shape: move the camera and re-render
   * (GameView.swift:198-219 keypress path) */
  rt_move_camera_position(world, 0.0f, 0.5f, 0.0f);
  RtRenderOptions opts = {4, 4, 0, 0, 0}; /* fast mode, threads=auto */
  if (rt_render(fb, world, &opts) != 0) {
    fprintf(stderr, "re-render failed: %s\n", rt_last_error());
    return 1;
  }

  free(pixels);
  rt_destroy_world(world);
  return 0;
}
