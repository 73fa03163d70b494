package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Replay of the reference's entire golden CLI acceptance corpus
  * (tests/scenarios in cube2222/octosql, run by tests/tester/main.go):
  * each `.in` file holds a shell command `[producer |] octosql "<SQL>"
  * [flags]`, executed with the scenario's directory as cwd; stdout must
  * byte-match `.out` and stderr `.err`.
  *
  * The runner drives `graft.Cli.execute` in-process with captured
  * streams and the producer's output injected as stdin.
  */
object GoldenRunner {

  case class Result(out: String, err: String, code: Int)

  private val CmdRe =
    """(?s)^(?:(.*?)\|\s*)?octosql\s+"(.*)"\s*(.*)$""".r

  def run(inFile: Path): Result = {
    val text = new String(Files.readAllBytes(inFile), StandardCharsets.UTF_8).trim
    val CmdRe(producer, sql, flagStr) = text
    val stdin = Option(producer).map(_.trim).filter(_.nonEmpty).map { p =>
      val pb = new ProcessBuilder("bash", "-c", p)
      pb.directory(inFile.getParent.toFile) // tester runs in the scenario dir
      val proc = pb.start()
      val out = new String(proc.getInputStream.readAllBytes(), StandardCharsets.UTF_8)
      proc.waitFor()
      out
    }
    val flags = Option(flagStr).getOrElse("").trim.split("\\s+").filter(_.nonEmpty)
    val args = Cli.parseArgs(Array(sql) ++ flags)
    val outBuf = new ByteArrayOutputStream()
    val errBuf = new ByteArrayOutputStream()
    val outPs = new PrintStream(outBuf, true, "UTF-8")
    val errPs = new PrintStream(errBuf, true, "UTF-8")
    val code = Cli.execute(SparkSpec.session, args,
      baseDir = inFile.getParent.toString, stdin = stdin, out = outPs, err = errPs)
    outPs.flush(); errPs.flush()
    Result(outBuf.toString("UTF-8"), errBuf.toString("UTF-8"), code)
  }

  def expected(inFile: Path, ext: String): String = {
    val f = Paths.get(inFile.toString.stripSuffix(".in") + ext)
    if (Files.exists(f)) new String(Files.readAllBytes(f), StandardCharsets.UTF_8) else ""
  }
}

class GoldenScenariosSpec extends SparkSpec {

  private val root = Paths.get("/root/reference/tests/scenarios")

  private val scenarios: Seq[Path] =
    if (Files.isDirectory(root))
      Files.walk(root).iterator().asScala
        .filter(_.toString.endsWith(".in")).toSeq.sortBy(_.toString)
    else Nil

  private def diff(name: String, expected: String, actual: String): String = {
    val e = expected.split("\n", -1)
    val a = actual.split("\n", -1)
    val lines = (0 until math.max(e.length, a.length)).collect {
      case i if e.applyOrElse(i, (_: Int) => "<missing>") != a.applyOrElse(i, (_: Int) => "<missing>") =>
        s"  line ${i + 1}:\n    want: ${e.applyOrElse(i, (_: Int) => "<missing>")}\n    got:  ${a.applyOrElse(i, (_: Int) => "<missing>")}"
    }
    s"$name mismatch (${lines.size} differing lines):\n" + lines.take(8).mkString("\n")
  }

  test("golden corpus is present (guard against silent skip)") {
    assert(Files.isDirectory(root),
      s"reference scenario corpus missing at $root — the golden replay would silently skip")
    assert(scenarios.size == 30, s"expected 30 scenarios, found ${scenarios.size}")
  }

  scenarios.foreach { in =>
    val name = root.relativize(in).toString.stripSuffix(".in")
    test(s"golden: $name") {
      val res = GoldenRunner.run(in)
      val wantOut = GoldenRunner.expected(in, ".out")
      val wantErr = GoldenRunner.expected(in, ".err")
      assert(res.out == wantOut, "\n" + diff("stdout", wantOut, res.out) +
        (if (res.err.nonEmpty && wantErr.isEmpty)
           "\n  stderr was:\n" + res.err.linesIterator.filter(_.startsWith("Error")).mkString("\n")
         else ""))
      assert(res.err == wantErr, "\n" + diff("stderr", wantErr, res.err))
    }
  }
}
