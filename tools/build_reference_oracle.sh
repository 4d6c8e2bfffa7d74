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
