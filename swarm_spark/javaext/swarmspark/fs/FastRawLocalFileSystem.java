package swarmspark.fs;

import java.io.File;
import java.io.IOException;
import org.apache.hadoop.fs.Path;
import org.apache.hadoop.fs.RawLocalFileSystem;
import org.apache.hadoop.fs.permission.FsPermission;

/**
 * RawLocalFileSystem without the per-file permission shell-outs.
 *
 * When the Hadoop native library is absent (the common pip-installed
 * PySpark setup), RawLocalFileSystem.setPermission and
 * mkOneDirWithMode fall back to forking a `chmod` process via
 * org.apache.hadoop.util.Shell for EVERY created file and directory.
 * A dynamic-partition write that creates ~800 partition dirs+files
 * pays ~2000 fork/execs (measured ~3 s of a 4.5 s write job; thread
 * dumps show all executor threads queued in Shell.runCommand /
 * ProcessImpl.forkAndExec). Local files are created with the process
 * umask already, so permission mirroring is a no-op locally; real
 * deployments talk to HDFS/S3 where this class is never used
 * (fs.file.impl only governs the file:// scheme).
 */
public class FastRawLocalFileSystem extends RawLocalFileSystem {

  @Override
  public void setPermission(Path p, FsPermission permission) throws IOException {
    // no-op: local files already carry the umask-derived mode
  }

  @Override
  protected boolean mkOneDirWithMode(Path p, File p2f, FsPermission permission)
      throws IOException {
    return p2f.mkdir();
  }
}
