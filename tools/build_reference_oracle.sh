#!/bin/bash
# Build the C++ reference physics core headless (GL stubbed) as a behavioral
# oracle.  Reads sources from the read-only reference mount; nothing is
# copied into this repository.  Output: $ORACLE_DIR/ref_headless.
set -euo pipefail
REF=${1:-/root/reference}
ORACLE_DIR=${ORACLE_DIR:-/tmp/avbd_oracle}
mkdir -p "$ORACLE_DIR/GL"

cat > "$ORACLE_DIR/GL/gl.h" <<'STUB'
#pragma once
typedef float GLfloat; typedef unsigned char GLubyte; typedef int GLenum; typedef unsigned int GLuint;
#define GL_LIGHTING 0
#define GL_POINTS 1
#define GL_LINES 2
#define GL_QUADS 3
#define GL_LINE_LOOP 4
#define GL_COLOR_MATERIAL 5
static inline void glDisable(int){} static inline void glEnable(int){}
static inline void glPointSize(float){} static inline void glLineWidth(float){}
static inline void glColor3f(float,float,float){} static inline void glBegin(int){}
static inline void glEnd(){} static inline void glVertex3fv(const float*){}
static inline void glPushMatrix(){} static inline void glPopMatrix(){}
static inline void glTranslatef(float,float,float){} static inline void glMultMatrixf(const float*){}
static inline void glScalef(float,float,float){} static inline void glNormal3fv(const float*){}
STUB

cat > "$ORACLE_DIR/main_oracle.cpp" <<'MAIN'
// Minimal diagnostics driver around the reference physics core.
#include "solver.h"
#include "scenes.h"
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <chrono>
int main(int argc, char** argv) {
    int steps = 300; const char* sceneName = "Stress1000"; int logEvery = 50;
    int dumpSteps = 0;  // per-step full body dump for the first N steps
    for (int i = 1; i < argc; ++i) {
        if (!strcmp(argv[i], "--steps") && i+1 < argc) steps = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--scene") && i+1 < argc) sceneName = argv[++i];
        else if (!strcmp(argv[i], "--log-every") && i+1 < argc) logEvery = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--dump-steps") && i+1 < argc) dumpSteps = atoi(argv[++i]);
    }
    Solver* solver = new Solver();
    for (int i = 0; i < sceneCount; ++i)
        if (!strcmp(sceneNames[i], sceneName)) { scenes[i](solver); break; }
    auto t0 = std::chrono::steady_clock::now();
    for (int s = 0; s < steps; ++s) {
        solver->step();
        if (s < dumpSteps) {
            const Solver::Diagnostics& d = solver->lastDiagnostics;
            printf("TRACE %d pen %.6f viol %.6f lin %.4f ang %.4f\n",
                   s+1, d.maxPenetration, d.maxConstraintViolation,
                   d.maxLinearSpeed, d.maxAngularSpeed);
            for (Rigid* b = solver->bodies; b; b = b->next)
                printf("BODY %d %d %.6f %.6f %.6f %.6f %.6f %.6f %.6f\n",
                       s+1, b->id, b->position.x, b->position.y, b->position.z,
                       b->orientation.x, b->orientation.y, b->orientation.z,
                       b->orientation.w);
        }
        if ((s+1) % logEvery == 0) {
            const Solver::Diagnostics& d = solver->lastDiagnostics;
            float miny = 1e9f; int below = 0;
            for (Rigid* b = solver->bodies; b; b = b->next) {
                if (b->invMass <= 0) continue;
                if (b->position.y < miny) miny = b->position.y;
                if (b->position.y < -0.1f) ++below;
            }
            printf("ORACLE step %d mf %d ct %d maxPen %.4f maxLin %.2f maxAng %.2f miny %.3f below %d\n",
                   s+1, d.activeManifolds, d.activeContacts, d.maxPenetration,
                   d.maxLinearSpeed, d.maxAngularSpeed, miny, below);
        }
    }
    double el = std::chrono::duration<double>(std::chrono::steady_clock::now()-t0).count();
    fprintf(stderr, "ORACLE %d steps in %.2fs = %.1f steps/s\n", steps, el, steps/el);
    return 0;
}
MAIN

g++ -O2 -std=c++17 -I"$ORACLE_DIR" -I"$REF/source" -o "$ORACLE_DIR/ref_headless" \
    "$ORACLE_DIR/main_oracle.cpp" \
    "$REF"/source/solver.cpp "$REF"/source/collision.cpp "$REF"/source/manifold.cpp \
    "$REF"/source/rigid.cpp "$REF"/source/force.cpp "$REF"/source/joint.cpp "$REF"/source/spring.cpp
echo "built $ORACLE_DIR/ref_headless"

# --- jointed-rod oracle: what the reference does with hard welds ---------
# (The reference ships joints commented-out as "WIP"; this driver wires the
# 15-segment rod its scenes.h:138-151 describes.  Measured result: the
# reference solver diverges to NaN on this scene — see PERF_NOTES.md.)
cat > "$ORACLE_DIR/main_rod.cpp" <<'MAIN'
#include "solver.h"
#include "joint.h"
#include <cstdio>
#include <cstring>
#include <cstdlib>
int main(int argc, char** argv) {
    int steps = 300;
    for (int i = 1; i < argc; ++i)
        if (!strcmp(argv[i], "--steps") && i+1 < argc) steps = atoi(argv[++i]);
    Solver* solver = new Solver();
    solver->defaultParams();
    Rigid* prev = nullptr;
    Rigid* segs[15];
    for (int i = 0; i < 15; ++i) {
        Rigid* curr = new Rigid(solver, {0.25f, 1.0f, 0.25f}, i == 0 ? 0.0f : 1.0f,
                                0.5f, {0, 10.0f - i, 0}, quat(), {0,0,0}, {0,0,0});
        segs[i] = curr;
        if (prev) new Joint(solver, prev, curr, {0, -0.5f, 0}, {0, 0.5f, 0});
        prev = curr;
    }
    for (int s = 0; s < steps; ++s) {
        solver->step();
        if ((s+1) % 25 == 0) {
            float maxDrift = 0;
            for (int i = 0; i + 1 < 15; ++i) {
                vec3 pa = segs[i]->position + rotate(segs[i]->orientation, vec3{0,-0.5f,0});
                vec3 pb = segs[i+1]->position + rotate(segs[i+1]->orientation, vec3{0,0.5f,0});
                float d = length(pa - pb);
                if (d > maxDrift) maxDrift = d;
            }
            printf("ROD step %d tip_y %.4f maxDrift %.3e maxLin %.4f\n",
                   s+1, segs[14]->position.y, maxDrift, solver->lastDiagnostics.maxLinearSpeed);
        }
    }
    return 0;
}
MAIN
g++ -O2 -std=c++17 -I"$ORACLE_DIR" -I"$REF/source" -o "$ORACLE_DIR/ref_rod" \
    "$ORACLE_DIR/main_rod.cpp" \
    "$REF"/source/solver.cpp "$REF"/source/collision.cpp "$REF"/source/manifold.cpp \
    "$REF"/source/rigid.cpp "$REF"/source/force.cpp "$REF"/source/joint.cpp "$REF"/source/spring.cpp
echo "built $ORACLE_DIR/ref_rod"

# --- ref_main: the UNMODIFIED reference main.cpp, headless-capable --------
# main.cpp's headless branch (main.cpp:189-248) never touches SDL/ImGui/GL,
# but the translation unit references them; stub headers make it compile
# unchanged.  This binary's --nogfx output is the byte-compat target for
# avbd3d_tpu.cli (tests/test_headless_compat.py).
mkdir -p "$ORACLE_DIR/SDL2" "$ORACLE_DIR/backends"

cat > "$ORACLE_DIR/GL/glu.h" <<'STUB'
#pragma once
static inline void gluPerspective(double,double,double,double){}
static inline void gluLookAt(double,double,double,double,double,double,double,double,double){}
STUB

cat >> "$ORACLE_DIR/GL/gl.h" <<'STUB'
#define GL_COLOR_BUFFER_BIT 0x4000
#define GL_DEPTH_BUFFER_BIT 0x0100
#define GL_PROJECTION 0x1701
#define GL_MODELVIEW 0x1700
#define GL_DEPTH_TEST 0x0B71
#define GL_LIGHT0 0x4000
#define GL_POSITION 0x1203
static inline void glViewport(int,int,int,int){}
static inline void glClearColor(float,float,float,float){}
static inline void glClear(int){}
static inline void glMatrixMode(int){}
static inline void glLoadIdentity(){}
static inline void glLightfv(int,int,const float*){}
STUB

cat > "$ORACLE_DIR/SDL2/SDL.h" <<'STUB'
#pragma once
/* the real SDL.h pulls these in transitively; main.cpp relies on that */
#include <string.h>
#include <math.h>
typedef struct SDL_Window SDL_Window;
typedef void* SDL_GLContext;
typedef struct { int sym; } SDL_Keysym;
typedef struct { SDL_Keysym keysym; } SDL_KeyboardEvent;
typedef struct { unsigned type; SDL_KeyboardEvent key; } SDL_Event;
#define SDL_INIT_VIDEO 0x20
#define SDL_GL_MULTISAMPLEBUFFERS 13
#define SDL_GL_MULTISAMPLESAMPLES 14
#define SDL_WINDOWPOS_CENTERED 0x2FFF0000
#define SDL_WINDOW_OPENGL 0x2
#define SDL_WINDOW_RESIZABLE 0x20
#define SDL_QUIT 0x100
#define SDL_KEYDOWN 0x300
#define SDLK_ESCAPE 27
static inline int SDL_Init(unsigned){return 0;}
static inline int SDL_GL_SetAttribute(int,int){return 0;}
static inline SDL_Window* SDL_CreateWindow(const char*,int,int,int,int,unsigned){return 0;}
static inline SDL_GLContext SDL_GL_CreateContext(SDL_Window*){return 0;}
static inline int SDL_GL_MakeCurrent(SDL_Window*,SDL_GLContext){return 0;}
static inline int SDL_GL_SetSwapInterval(int){return 0;}
static inline int SDL_PollEvent(SDL_Event*){return 0;}
static inline void SDL_GetWindowSize(SDL_Window*,int*w,int*h){*w=1280;*h=720;}
static inline void SDL_GL_SwapWindow(SDL_Window*){}
static inline void SDL_GL_DeleteContext(SDL_GLContext){}
static inline void SDL_DestroyWindow(SDL_Window*){}
static inline void SDL_Quit(){}
STUB

cat > "$ORACLE_DIR/imgui.h" <<'STUB'
#pragma once
#define IMGUI_CHECKVERSION()
enum { ImGuiMouseButton_Left = 0, ImGuiMouseButton_Right = 1, ImGuiMouseButton_Middle = 2 };
enum { ImGuiKey_LeftShift = 527 };
enum { ImGuiSliderFlags_Logarithmic = 1 << 5 };
struct ImVec2 { float x, y; };
struct ImGuiIO { bool WantCaptureMouse; ImVec2 MouseDelta; float MouseWheel; };
struct ImDrawData {};
namespace ImGui {
static inline bool Begin(const char*) { return true; }
static inline void End() {}
static inline void Text(const char*, ...) {}
static inline void Separator() {}
static inline bool BeginCombo(const char*, const char*) { return false; }
static inline bool Selectable(const char*, bool) { return false; }
static inline void SetItemDefaultFocus() {}
static inline void EndCombo() {}
static inline bool Button(const char*) { return false; }
static inline void SameLine() {}
static inline bool SliderFloat(const char*, float*, float, float, const char* = "%.3f", int = 0) { return false; }
static inline bool SliderFloat3(const char*, float*, float, float) { return false; }
static inline bool SliderInt(const char*, int*, int, int) { return false; }
static inline bool Checkbox(const char*, bool*) { return false; }
static inline ImGuiIO& GetIO() { static ImGuiIO io; return io; }
static inline bool IsMouseDown(int) { return false; }
static inline bool IsKeyDown(int) { return false; }
static inline bool IsMouseClicked(int) { return false; }
static inline void NewFrame() {}
static inline void Render() {}
static inline ImDrawData* GetDrawData() { static ImDrawData d; return &d; }
static inline void CreateContext() {}
static inline void StyleColorsDark() {}
static inline void DestroyContext() {}
}
STUB

cat > "$ORACLE_DIR/backends/imgui_impl_sdl2.h" <<'STUB'
#pragma once
struct SDL_Window; union SDL_EventU;
static inline bool ImGui_ImplSDL2_ProcessEvent(const void*) { return false; }
static inline void ImGui_ImplSDL2_NewFrame() {}
static inline bool ImGui_ImplSDL2_InitForOpenGL(SDL_Window*, void*) { return true; }
static inline void ImGui_ImplSDL2_Shutdown() {}
STUB

cat > "$ORACLE_DIR/backends/imgui_impl_opengl3.h" <<'STUB'
#pragma once
struct ImDrawData;
static inline bool ImGui_ImplOpenGL3_Init(const char*) { return true; }
static inline void ImGui_ImplOpenGL3_NewFrame() {}
static inline void ImGui_ImplOpenGL3_RenderDrawData(ImDrawData*) {}
static inline void ImGui_ImplOpenGL3_Shutdown() {}
STUB

g++ -O2 -std=c++17 -I"$ORACLE_DIR" -I"$REF/source" -o "$ORACLE_DIR/ref_main" \
    "$REF"/source/main.cpp \
    "$REF"/source/solver.cpp "$REF"/source/collision.cpp "$REF"/source/manifold.cpp \
    "$REF"/source/rigid.cpp "$REF"/source/force.cpp "$REF"/source/joint.cpp "$REF"/source/spring.cpp
echo "built $ORACLE_DIR/ref_main"

# --- ref_stressn: parametric stress scene (N-body C++ baseline) -----------
# The reference caps at Stress1000; this driver reuses its exact grid/jitter
# construction (scenes.h:87-132) at --nx/--ny/--nz for honest C++ baselines
# at 2048/4096 bodies (grid-tier targets).
cat > "$ORACLE_DIR/main_stressn.cpp" <<'MAIN'
#include "solver.h"
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <chrono>
static float hashFloat01(unsigned int x) {
    x ^= x >> 16; x *= 0x7feb352dU; x ^= x >> 15; x *= 0x846ca68bU; x ^= x >> 16;
    return (x & 0x00FFFFFFU) / 16777215.0f;
}
int main(int argc, char** argv) {
    int steps = 300, nx = 10, ny = 10, nz = 10, logEvery = 100;
    for (int i = 1; i < argc; ++i) {
        if (!strcmp(argv[i], "--steps") && i+1 < argc) steps = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--nx") && i+1 < argc) nx = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--ny") && i+1 < argc) ny = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--nz") && i+1 < argc) nz = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--log-every") && i+1 < argc) logEvery = atoi(argv[++i]);
    }
    Solver* solver = new Solver();
    new Rigid(solver, {100, 1, 100}, 0.0f, 0.5f, {0, -0.5f, 0}, quat(), {0,0,0}, {0,0,0});
    solver->iterations = 20; solver->beta = 30000.0f; solver->gamma = 0.995f;
    for (int y = 0; y < ny; ++y) for (int z = 0; z < nz; ++z) for (int x = 0; x < nx; ++x) {
        unsigned int seed = (unsigned int)(x + nx * (z + nz * y) + 1);
        float jx = (hashFloat01(seed * 9781U) * 2.0f - 1.0f) * 0.04f;
        float jz = (hashFloat01(seed * 6271U) * 2.0f - 1.0f) * 0.04f;
        float jy = hashFloat01(seed * 3343U) * 0.25f;
        float px = (x - (nx - 1) * 0.5f) * 1.15f + jx;
        float py = 20.0f + y * 2.0f + jy;
        float pz = (z - (nz - 1) * 0.5f) * 1.15f + jz;
        new Rigid(solver, {1,1,1}, 1.0f, 0.5f, {px, py, pz}, quat(), {0,0,0}, {0,0,0});
    }
    auto t0 = std::chrono::steady_clock::now();
    auto tPrev = t0;
    for (int s = 0; s < steps; ++s) {
        solver->step();
        if ((s+1) % logEvery == 0) {
            auto now = std::chrono::steady_clock::now();
            double blk = std::chrono::duration<double>(now - tPrev).count();
            tPrev = now;
            const Solver::Diagnostics& d = solver->lastDiagnostics;
            printf("STRESSN step %d mf %d ct %d maxPen %.4f block_sps %.2f\n",
                   s+1, d.activeManifolds, d.activeContacts, d.maxPenetration,
                   logEvery / blk);
            fflush(stdout);
        }
    }
    double el = std::chrono::duration<double>(std::chrono::steady_clock::now()-t0).count();
    printf("STRESSN total %d steps in %.2fs = %.2f steps/s\n", steps, el, steps/el);
    return 0;
}
MAIN
g++ -O2 -std=c++17 -I"$ORACLE_DIR" -I"$REF/source" -o "$ORACLE_DIR/ref_stressn" \
    "$ORACLE_DIR/main_stressn.cpp" \
    "$REF"/source/solver.cpp "$REF"/source/collision.cpp "$REF"/source/manifold.cpp \
    "$REF"/source/rigid.cpp "$REF"/source/force.cpp "$REF"/source/joint.cpp "$REF"/source/spring.cpp
echo "built $ORACLE_DIR/ref_stressn"
