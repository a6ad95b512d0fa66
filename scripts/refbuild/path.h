#ifndef HAVE_RECUR_PATH_H
#define HAVE_RECUR_PATH_H
#define BASE_PATH "/tmp/refbuild"
#define TEST_DATA_DIR "/root/reference/test-images"
#define TEST_VIDEO_DIR "/tmp/refbuild/test-video"
#define TEST_AUDIO_DIR "/tmp/refbuild/test-audio"
#define DEBUG_IMAGE_DIR "/tmp/refbuild/images"
#endif
