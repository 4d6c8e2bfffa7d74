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
    for (int i = 1; i < argc; ++i) {
        if (!strcmp(argv[i], "--steps") && i+1 < argc) steps = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--scene") && i+1 < argc) sceneName = argv[++i];
        else if (!strcmp(argv[i], "--log-every") && i+1 < argc) logEvery = atoi(argv[++i]);
    }
    Solver* solver = new Solver();
    for (int i = 0; i < sceneCount; ++i)
        if (!strcmp(sceneNames[i], sceneName)) { scenes[i](solver); break; }
    auto t0 = std::chrono::steady_clock::now();
    for (int s = 0; s < steps; ++s) {
        solver->step();
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
