package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.octo._
import graft.sql.{Dialect, Resolver}
import graft.sql.Resolver._

/** The typed overload resolver's pure algorithm, against the reference's
  * octosql/types.go relation semantics and logical/function.go +
  * logical/group_by.go resolution order.
  */
class ResolverSpec extends AnyFunSuite {

  private val NInt = OUnion(Seq(ONull, OInt))
  private val NStr = OUnion(Seq(ONull, OString))

  test("type relation: exact, union-maybe, Any, lists") {
    assert(isRel(OInt, OInt) == Is)
    assert(isRel(OInt, OFloat) == Isnt)
    assert(isRel(OUnion(Seq(OInt, OString)), OString) == Maybe)
    assert(isRel(NInt, NInt) == Is)
    assert(isRel(OInt, NInt) == Is)            // Int fits Int|NULL
    assert(isRel(NInt, OInt) == Maybe)         // Int|NULL maybe-fits Int
    assert(isRel(OString, OAny) == Is)
    assert(isRel(OList(Some(OInt)), OList(Some(OInt))) == Is)
    assert(isRel(OList(Some(OInt)), OList(Some(OFloat))) == Isnt)
    assert(isRel(OList(None), OList(Some(OInt))) == Is) // empty list fits any list
  }

  test("nonNullable and typeIntersection (types.go:384-441)") {
    assert(nonNullable(NInt) == OInt)
    assert(nonNullable(ONull) == ONull)
    assert(nonNullable(OUnion(Seq(ONull, OInt, OString))) == OUnion(Seq(OInt, OString)))
    assert(typeIntersection(NInt, OUnion(Seq(OInt, OString))) == Some(OInt))
    assert(typeIntersection(OInt, OString).isEmpty)
  }

  test("exact resolution: strict descriptors match through nullability") {
    val r = resolveFunction("+", Seq(OInt, OInt))
    assert(r.outputType == OInt && r.assertions.forall(_.isEmpty))
    // nullable arg still matches the strict (Int, Int) overload, output
    // gains | NULL (function.go:135-141)
    val rn = resolveFunction("+", Seq(NInt, OInt))
    assert(rn.outputType == NInt)
    // string concat picks the (String, String) overload
    assert(resolveFunction("+", Seq(OString, OString)).outputType == OString)
  }

  test("reference strictness: no Int↔Float coercion, sqrt is Float-only") {
    val e1 = intercept[Dialect.TypecheckException](resolveFunction("+", Seq(OInt, OFloat)))
    assert(e1.getMessage == "unknown function: +(Int, Float)")
    val e2 = intercept[Dialect.TypecheckException](resolveFunction("sqrt", Seq(OInt)))
    assert(e2.getMessage == "unknown function: sqrt(Int)")
    val e3 = intercept[Dialect.TypecheckException](resolveFunction("-", Seq(OTime, OTime)))
    assert(e3.getMessage == "unknown function: -(Time, Time)")
    // error text renders the ORIGINAL (nullable-union) type, like
    // arguments[i].Type.String()
    val e4 = intercept[Dialect.TypecheckException](resolveFunction("sqrt", Seq(NInt)))
    assert(e4.getMessage == "unknown function: sqrt(NULL | Int)")
  }

  test("comparators require equal types; NULL < NULL typechecks") {
    assert(resolveFunction("<", Seq(OInt, OInt)).outputType == OBoolean)
    // NULL < NULL typechecks (equal types) — strict widens out to | NULL
    assert(resolveFunction("<", Seq(ONull, ONull)).outputType ==
      OUnion(Seq(ONull, OBoolean)))
    assert(resolveFunction("<", Seq(NInt, OInt)).outputType ==
      OUnion(Seq(ONull, OBoolean))) // strict null pass-through
    val e = intercept[Dialect.TypecheckException](resolveFunction("<", Seq(OInt, OFloat)))
    assert(e.getMessage == "unknown function: <(Int, Float)")
    val e2 = intercept[Dialect.TypecheckException](resolveFunction("<", Seq(OInt, ONull)))
    assert(e2.getMessage == "unknown function: <(Int, NULL)")
  }

  test("Maybe pass inserts TypeAssertions (function.go:81-125)") {
    // Int|String maybe-fits upper(String): assertion target is
    // String | NULL (strict descriptors pass NULL through)
    val r = resolveFunction("upper", Seq(OUnion(Seq(OInt, OString))))
    assert(r.outputType == OString)
    assert(r.assertions == Seq(Some(OUnion(Seq(ONull, OString)))))
    // an exactly-matching arg in the same call gets no assertion
    val r2 = resolveFunction("substr", Seq(OUnion(Seq(OInt, OString)), OInt))
    assert(r2.assertions == Seq(Some(OUnion(Seq(ONull, OString))), None))
  }

  test("typeFn descriptors: len over list/struct, indexing, membership") {
    assert(resolveFunction("len", Seq(OString)).outputType == OInt)
    assert(resolveFunction("len", Seq(OList(Some(OFloat)))).outputType == OInt)
    assert(resolveFunction("len", Seq(OStruct(Seq("a" -> OInt)))).outputType == OInt)
    val e = intercept[Dialect.TypecheckException](resolveFunction("len", Seq(OInt)))
    assert(e.getMessage == "unknown function: len(Int)")
    assert(resolveFunction("[]", Seq(OList(Some(OFloat)), OInt)).outputType ==
      OUnion(Seq(ONull, OFloat)))
    assert(resolveFunction("in", Seq(OInt, OList(Some(OInt)))).outputType == OBoolean)
  }

  test("unknown names error with the reference text") {
    val e = intercept[Dialect.TypecheckException](resolveFunction("frobnicate", Seq(OInt)))
    assert(e.getMessage == "unknown function: frobnicate(Int)")
  }

  test("aggregate resolution: NULL always admitted, first match wins") {
    assert(resolveAggregate("sum", OInt).outputType == OInt)
    assert(resolveAggregate("sum", NInt).outputType == NInt) // | NULL out
    assert(resolveAggregate("count", OString).outputType == OInt)
    assert(resolveAggregate("array_agg", OFloat).outputType == OList(Some(OFloat)))
    // min has no Time overload, max does (aggregates/min.go vs max.go)
    assert(resolveAggregate("max", OTime).outputType == OTime)
    val e = intercept[Dialect.TypecheckException](resolveAggregate("min", OTime))
    assert(e.getMessage == "unknown aggregate: min(Time)")
    val e2 = intercept[Dialect.TypecheckException](resolveAggregate("sum", OString))
    assert(e2.getMessage == "unknown aggregate: sum(String)")
  }

  test("aggregate Maybe pass asserts to the descriptor type") {
    val r = resolveAggregate("sum", OUnion(Seq(OInt, OString)))
    assert(r.assertion == Some(OInt) && r.outputType == OInt)
  }

  test("table-driven: every positional descriptor resolves to itself") {
    // feeding each descriptor its own declared argument types must
    // resolve (exact pass) and yield its declared output — guards the
    // table against typos as it grows with the reference
    Resolver.functions.foreach { case (name, details) =>
      details.descriptors.zipWithIndex
        .filter(_._1.typeFn.isEmpty)
        .foreach { case (d, _) =>
          val r = resolveFunction(name, d.argumentTypes)
          // modulo NULL-widening: an Any parameter admits NULL, which
          // triggers the strict pass-through on its own signature
          assert(isRel(nonNullable(r.outputType), d.outputType) == Is,
            s"$name(${d.argumentTypes.map(_.display).mkString(", ")}) -> " +
              s"${r.outputType.display}, table says ${d.outputType.display}")
          assert(r.assertions.forall(_.isEmpty), s"$name needed Maybe pass")
        }
    }
    Resolver.aggregates.foreach { case (name, (_, ds)) =>
      ds.filter(_.typeFn.isEmpty).foreach { d =>
        val r = resolveAggregate(name, d.argumentType)
        assert(isRel(nonNullable(r.outputType), d.outputType) == Is, s"$name")
      }
    }
  }

  test("table-driven: one-past-arity calls are unknown functions") {
    // appending one extra Int to every fixed-arity signature must fail
    // (the reference has no variadic positional descriptors)
    Resolver.functions.foreach { case (name, details) =>
      val arities = details.descriptors.filter(_.typeFn.isEmpty)
        .map(_.argumentTypes.length).toSet
      val hasTypeFn = details.descriptors.exists(_.typeFn.isDefined)
      if (!hasTypeFn && arities.nonEmpty) {
        val maxA = arities.max
        val args = Seq.fill(maxA + 1)(OInt: OType)
        intercept[Dialect.TypecheckException](resolveFunction(name, args))
      }
    }
  }

  test("Spark→octosql type mapping (dialect storage conventions)") {
    import org.apache.spark.sql.types._
    assert(ofDataType(LongType, nullable = false) == Some(OInt))
    assert(ofDataType(DoubleType, nullable = true) == Some(OUnion(Seq(ONull, OFloat))))
    assert(ofDataType(DecimalType(38, 9), nullable = false) == Some(ODuration))
    assert(ofDataType(TimestampType, nullable = false) == Some(OTime))
    assert(ofDataType(ArrayType(StringType, false), nullable = false) ==
      Some(OList(Some(OString))))
    assert(ofDataType(VariantType, nullable = false).isEmpty) // legacy path
    assert(ofDataType(NullType, nullable = true) == Some(ONull))
  }
}
