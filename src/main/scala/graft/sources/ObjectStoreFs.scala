package graft.sources

import java.io.{EOFException, FileNotFoundException, InputStream, IOException, OutputStream}
import java.net.URI
import java.nio.ByteBuffer
import java.nio.channels.FileChannel
import java.nio.file.{FileAlreadyExistsException => NioExists, FileVisitResult, Files, Path => JPath, Paths, SimpleFileVisitor, StandardCopyOption, StandardOpenOption}
import java.nio.file.attribute.BasicFileAttributes
import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, DelegateToFileSystem, FSDataInputStream, FSDataOutputStream, FileAlreadyExistsException, FileStatus, FileSystem, Path, PositionedReadable, Seekable}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** A faithful S3-class object store as a Hadoop `FileSystem`, backed by a
  * local directory — the exercised form of the "object-store layout is a
  * Hadoop-conf swap" claim (the reference stores every layer in MinIO/S3
  * buckets, `scripts/utils.py:19-27`, bucket URIs
  * `bronze_dimension_fact_load.py:66-67`).
  *
  * This is NOT a convenience alias for the local filesystem: each operation
  * implements the object-store contract, so running the medallion + OCC
  * commit protocol over `s3g://bucket/...` proves the pipeline depends only
  * on primitives S3-class stores actually provide:
  *
  *  - '''PUT is all-or-nothing''': `create` streams to a hidden staging
  *    object; `close()` makes the key visible in one atomic step. A reader
  *    never observes a partially-written object (S3 semantics), and a
  *    crashed writer leaves nothing visible.
  *  - '''Conditional PUT''' (`create(path, overwrite = false)`): visibility
  *    uses an atomic exclusive link, so exactly one of N racing writers
  *    succeeds — the `If-None-Match: *` primitive Delta/Iceberg commit on,
  *    and the only synchronization `Medallion.publishGoldOcc` needs.
  *  - '''No atomic rename''': `rename` is server-side COPY + DELETE (what
  *    S3A actually does), with copied bytes counted in [[ObjectStoreFileSystem.renameCopiedBytes]]
  *    so tests can PROVE the non-atomic path ran. Anything that still works
  *    over this filesystem provably does not lean on rename atomicity.
  *  - '''No append''': `append` throws, as on S3.
  *  - Directories are emulated markers (as in S3A): `mkdirs` succeeds
  *    without creating objects a reader could confuse for data.
  *
  * Block size is reported as 32 MiB so Spark's file-split planning behaves
  * as it would against a real store. Not modeled: request latency and
  * eventual-consistency of listings (S3 has been strongly consistent since
  * 2020-12, so read-after-write listing IS the real contract now).
  *
  * Wire-up (the conf swap, nothing else changes):
  * {{{
  *   spark.hadoop.fs.s3g.impl                  graft.sources.ObjectStoreFileSystem
  *   spark.hadoop.fs.AbstractFileSystem.s3g.impl graft.sources.S3gAbstractFs
  *   spark.hadoop.graft.s3g.base               /path/backing/dir
  * }}}
  * A production deployment swaps `s3g` for `s3a` plus the hadoop-aws jar
  * and credentials — no graft code changes.
  */
class ObjectStoreFileSystem extends FileSystem {

  private var uri: URI = _
  private var base: JPath = _
  private var workDir: Path = _
  private var puts: JPath = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    val bucket = Option(name.getAuthority).getOrElse(
      throw new IOException(s"s3g URI needs a bucket authority: $name"))
    uri = URI.create(s"s3g://$bucket")
    val baseRoot = conf.get("graft.s3g.base",
      sys.props("java.io.tmpdir") + "/graft-s3g")
    base = Paths.get(baseRoot, bucket)
    puts = base.resolve(".puts")
    Files.createDirectories(puts)
    workDir = new Path(uri.toString + "/")
  }

  override def getScheme: String = "s3g"
  override def getUri: URI = uri
  override def getWorkingDirectory: Path = workDir
  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }

  /** Object key of a path ("" = bucket root). */
  private def keyOf(p: Path): String =
    makeQualified(p).toUri.getPath.stripPrefix("/")

  private def toLocal(p: Path): JPath = {
    val k = keyOf(p)
    if (k.isEmpty) base else base.resolve(k)
  }

  private def toPath(l: JPath): Path = {
    val rel = base.relativize(l).toString.replace(java.io.File.separatorChar, '/')
    new Path(if (rel.isEmpty) uri.toString + "/" else uri.toString + "/" + rel)
  }

  private def status(l: JPath): FileStatus = {
    val attrs = Files.readAttributes(l, classOf[BasicFileAttributes])
    new FileStatus(if (attrs.isDirectory) 0 else attrs.size(), attrs.isDirectory,
      1, ObjectStoreFileSystem.BlockSize, attrs.lastModifiedTime().toMillis, toPath(l))
  }

  override def getFileStatus(f: Path): FileStatus = {
    val l = toLocal(f)
    if (!Files.exists(l)) throw new FileNotFoundException(f.toString)
    status(l)
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val l = toLocal(f)
    if (!Files.exists(l)) throw new FileNotFoundException(f.toString)
    if (!Files.isDirectory(l)) Array(status(l))
    else {
      val out = scala.collection.mutable.ArrayBuffer[FileStatus]()
      val ds = Files.newDirectoryStream(l)
      try {
        val it = ds.iterator()
        while (it.hasNext) {
          val c = it.next()
          // An entry can vanish between the directory read and its stat —
          // exactly S3's LIST consistency contract (a LISTed key may 404 by
          // the time it is GET), and this shim's replace-by-delete+create
          // pointer flips hit the window under concurrent writers. A real
          // store would simply not return the key; skip it.
          if (c.getFileName.toString != ".puts")
            try out += status(c)
            catch { case _: java.nio.file.NoSuchFileException => }
        }
      } finally ds.close()
      out.toArray
    }
  }

  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    Files.createDirectories(toLocal(f)); true
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val l = toLocal(f)
    if (!Files.exists(l)) throw new FileNotFoundException(f.toString)
    if (Files.isDirectory(l)) throw new IOException(s"cannot open a directory: $f")
    new FSDataInputStream(
      new ObjectStoreFileSystem.NioIn(FileChannel.open(l, StandardOpenOption.READ)))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    val dst = toLocal(f)
    if (Files.isDirectory(dst)) throw new FileAlreadyExistsException(s"$f is a directory")
    // early reject is a courtesy; the authoritative exclusive check is the
    // atomic link at close() — two racing creates both reach here, exactly
    // one close() succeeds (conditional-PUT semantics)
    if (!overwrite && Files.exists(dst)) throw new FileAlreadyExistsException(f.toString)
    Files.createDirectories(dst.getParent)
    val tmp = puts.resolve("put-" + java.util.UUID.randomUUID().toString)
    new FSDataOutputStream(
      new ObjectStoreFileSystem.PutStream(tmp, dst, overwrite, f), statistics)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append; PUT a new object")

  override def rename(src: Path, dst: Path): Boolean = {
    val ls = toLocal(src)
    if (!Files.exists(ls)) return false
    var ld = toLocal(dst)
    if (Files.exists(ld)) {
      if (!Files.isDirectory(ld)) return false // existing object: no clobber
      ld = ld.resolve(ls.getFileName) // HDFS contract: move INTO existing dir
      if (Files.exists(ld)) return false
    }
    Files.createDirectories(ld.getParent)
    // server-side COPY of every object, then DELETE of the source — the
    // S3A shape; deliberately never a filesystem-level atomic move
    val target = ld
    Files.walkFileTree(ls, new SimpleFileVisitor[JPath] {
      override def preVisitDirectory(dir: JPath, a: BasicFileAttributes): FileVisitResult = {
        Files.createDirectories(target.resolve(ls.relativize(dir).toString)); FileVisitResult.CONTINUE
      }
      override def visitFile(file: JPath, a: BasicFileAttributes): FileVisitResult = {
        Files.copy(file, target.resolve(ls.relativize(file).toString),
          StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.COPY_ATTRIBUTES)
        ObjectStoreFileSystem.renameCopiedBytes.addAndGet(a.size())
        FileVisitResult.CONTINUE
      }
    })
    deleteRecursively(ls)
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val l = toLocal(f)
    if (!Files.exists(l)) return false
    if (Files.isDirectory(l) && !recursive) {
      val ds = Files.newDirectoryStream(l)
      val nonEmpty = try ds.iterator().hasNext finally ds.close()
      if (nonEmpty) throw new IOException(s"directory not empty and recursive=false: $f")
    }
    deleteRecursively(l)
    true
  }

  private def deleteRecursively(l: JPath): Unit =
    Files.walkFileTree(l, new SimpleFileVisitor[JPath] {
      override def visitFile(file: JPath, a: BasicFileAttributes): FileVisitResult = {
        Files.delete(file); FileVisitResult.CONTINUE
      }
      override def postVisitDirectory(dir: JPath, e: IOException): FileVisitResult = {
        Files.delete(dir); FileVisitResult.CONTINUE
      }
    })
}

object ObjectStoreFileSystem {
  val BlockSize: Long = 32L * 1024 * 1024

  /** Bytes moved by copy+delete renames — the observable that proves the
    * non-atomic rename path actually ran under a workload. */
  val renameCopiedBytes = new AtomicLong(0L)

  /** Seekable + positioned reads over a local channel (what the store's GET
    * with Range requests provides). */
  private final class NioIn(ch: FileChannel) extends InputStream
      with Seekable with PositionedReadable {
    private var pos = 0L
    override def read(): Int = {
      val one = new Array[Byte](1)
      val n = read(one, 0, 1)
      if (n <= 0) -1 else one(0) & 0xff
    }
    override def read(b: Array[Byte], off: Int, len: Int): Int = {
      val n = ch.read(ByteBuffer.wrap(b, off, len), pos)
      if (n > 0) pos += n
      n
    }
    override def seek(p: Long): Unit = { pos = p }
    override def getPos: Long = pos
    override def seekToNewSource(p: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int, length: Int): Int =
      ch.read(ByteBuffer.wrap(buffer, offset, length), position)
    override def readFully(position: Long, buffer: Array[Byte], offset: Int, length: Int): Unit = {
      var done = 0
      while (done < length) {
        val n = read(position + done, buffer, offset + done, length - done)
        if (n < 0) throw new EOFException(s"EOF at ${position + done}")
        done += n
      }
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
    override def available(): Int =
      math.min(Int.MaxValue.toLong, math.max(0L, ch.size() - pos)).toInt
    override def close(): Unit = ch.close()
  }

  /** Staged PUT: bytes land in a hidden staging object; close() publishes
    * atomically (move for overwrite, exclusive hard link for conditional). */
  private final class PutStream(tmp: JPath, dst: JPath, overwrite: Boolean,
                                hPath: Path) extends OutputStream {
    private val out = Files.newOutputStream(tmp, StandardOpenOption.CREATE_NEW)
    private var closed = false
    override def write(b: Int): Unit = out.write(b)
    override def write(b: Array[Byte], off: Int, len: Int): Unit = out.write(b, off, len)
    override def flush(): Unit = out.flush()
    override def close(): Unit = {
      if (closed) return
      closed = true
      out.close()
      try {
        if (overwrite)
          Files.move(tmp, dst, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
        else {
          // hard-link creation is the one POSIX op that is atomically
          // exclusive — rename(2) silently replaces, so it cannot model a
          // conditional PUT
          try Files.createLink(dst, tmp)
          catch {
            case _: NioExists =>
              throw new FileAlreadyExistsException(
                s"conditional PUT failed, key exists: $hPath")
          }
        }
      } finally Files.deleteIfExists(tmp)
    }
  }
}

/** `AbstractFileSystem` binding so `FileContext` callers (Medallion's
  * pointer flip) resolve the s3g scheme; constructor signature is the one
  * FileContext instantiates reflectively. */
class S3gAbstractFs(theUri: URI, conf: Configuration)
  extends DelegateToFileSystem(theUri, new ObjectStoreFileSystem, conf, "s3g", false) {
  override def getUriDefaultPort: Int = -1
}
