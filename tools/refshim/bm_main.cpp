// Headless driver for the reference CPU block matcher (testBM,
// BlockMatching/BlockMatching.cpp:7-87): reads two 8-bit binary PGMs
// (already-gray inputs so the diff isolates the matcher itself), runs
// testBM at the given SAD half-window and search range (the singleFrame
// demo uses 5 / 64, Caller.cpp:19), writes the disparity as PGM.
//
// Part of this repo's verification harness; contains no reference code.
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "BlockMatching.h"

static cv::Mat read_pgm(const char* path) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path);
    std::exit(2);
  }
  int w = 0, h = 0, maxv = 0;
  if (std::fscanf(f, "P5 %d %d %d", &w, &h, &maxv) != 3 || maxv != 255) {
    std::fprintf(stderr, "%s: not an 8-bit binary PGM\n", path);
    std::exit(2);
  }
  std::fgetc(f);
  cv::Mat m(h, w, CV_8UC1);
  if (std::fread(m.data, 1, (size_t)w * h, f) != (size_t)w * h) std::exit(2);
  std::fclose(f);
  return m;
}

int main(int argc, char** argv) {
  if (argc < 6) {
    std::fprintf(stderr,
                 "usage: %s left.pgm right.pgm out.pgm SAD searchRange\n",
                 argv[0]);
    return 1;
  }
  cv::Mat left = read_pgm(argv[1]);
  cv::Mat right = read_pgm(argv[2]);
  cv::Mat disp;
  testBM(left, right, disp, std::atoi(argv[4]), std::atoi(argv[5]));
  std::FILE* f = std::fopen(argv[3], "wb");
  std::fprintf(f, "P5\n%d %d\n255\n", disp.cols, disp.rows);
  std::fwrite(disp.data, 1, (size_t)disp.cols * disp.rows, f);
  std::fclose(f);
  return 0;
}
